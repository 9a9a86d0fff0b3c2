#!/usr/bin/env python
"""Trajectory evaluation: ATE / RPE scoring + plots.

Replaces the reference's offline eval scripts (`src/liorf/scripts/test.py`,
`plot_trajectory.py`, `realtime_plot.py` — CSV/bag plotting of odometry vs
GPS): reads estimated + ground-truth trajectories (npz with `poses` (T,6)
[roll,pitch,yaw,x,y,z] and optional `stamps`, or CSV x,y,z columns) and
reports ATE RMSE, RPE, and an overlay plot.

    python tools/eval_trajectory.py est.npz truth.npz --plot out.png
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def load_traj(path: str, bag_topic: str = "/liorf/mapping/odometry"):
    """Returns (poses (T,6), stamps (T,) or None)."""
    if path.endswith(".npz"):
        d = np.load(path)
        stamps = np.asarray(d["stamps"], np.float64) if "stamps" in d else None
        return np.asarray(d["poses"], np.float64), stamps
    if path.endswith(".bag"):
        # recorded odometry bag (Runner --record-bag, or the reference's
        # `rosbag record /liorf/mapping/odometry` workflow, README.md:173-198)
        import os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from lio_slam_tpu.io import rosbag as rb
        poses, stamps = [], []
        for m in rb.BagReader(path).read_messages([bag_topic]):
            od = rb.decode_odometry(m.raw)
            q = od.orientation  # x y z w
            # yaw/pitch/roll from quaternion (ZYX)
            x, y, z, w = q
            roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
            pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
            yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
            poses.append([roll, pitch, yaw, *od.position])
            stamps.append(od.stamp)
        if not poses:
            raise SystemExit(f"no {bag_topic} messages in {path}")
        return np.asarray(poses, np.float64), np.asarray(stamps, np.float64)
    data = np.loadtxt(path, delimiter=",", ndmin=2)
    if data.shape[1] >= 6:
        return data[:, :6], None
    out = np.zeros((data.shape[0], 6))
    out[:, 3:3 + data.shape[1]] = data
    return out, None


def align_by_stamp(est, est_st, truth, truth_st):
    """Pair each estimate with the nearest-stamp truth pose — a throttled or
    keyframe-gated run records fewer poses than the truth sequence, so
    index-pairing would compare different times (the reference's eval scripts
    have the same pitfall; ATE would silently drift one index per drop)."""
    if est_st is None or truth_st is None:
        n = min(len(est), len(truth))
        if len(est) != len(truth):
            print(f"warning: length mismatch ({len(est)} vs {len(truth)}) "
                  "and no stamps to align by — pairing by index",
                  file=sys.stderr)
        return est[:n], truth[:n]
    j = np.searchsorted(truth_st, est_st)
    j = np.clip(j, 1, len(truth_st) - 1)
    left = np.abs(truth_st[j - 1] - est_st) <= np.abs(truth_st[j] - est_st)
    j = np.where(left, j - 1, j)
    return est, truth[j]


def align_umeyama(est: np.ndarray, truth: np.ndarray):
    """SE(3) alignment (no scale) of est positions onto truth."""
    mu_e = est.mean(0)
    mu_t = truth.mean(0)
    H = (est - mu_e).T @ (truth - mu_t)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    t = mu_t - R @ mu_e
    return (R @ est.T).T + t


def ate_rmse(est: np.ndarray, truth: np.ndarray, align: bool = True) -> float:
    p_e, p_t = est[:, 3:6], truth[:, 3:6]
    if align:
        p_e = align_umeyama(p_e, p_t)
    d = p_e - p_t
    return float(np.sqrt((d * d).sum(1).mean()))


def rpe(est: np.ndarray, truth: np.ndarray, delta: int = 10):
    """Relative pose error over `delta`-frame intervals (translation RMSE)."""
    errs = []
    for i in range(len(est) - delta):
        de = est[i + delta, 3:6] - est[i, 3:6]
        dt = truth[i + delta, 3:6] - truth[i, 3:6]
        errs.append(np.linalg.norm(de) - np.linalg.norm(dt))
    errs = np.asarray(errs)
    return float(np.sqrt((errs * errs).mean())) if len(errs) else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("truth")
    ap.add_argument("--no-align", action="store_true")
    ap.add_argument("--rpe-delta", type=int, default=10)
    ap.add_argument("--plot", default=None)
    ap.add_argument("--bag-topic", default="/liorf/mapping/odometry",
                    help="odometry topic when an input is a .bag")
    args = ap.parse_args()

    est, est_st = load_traj(args.est, args.bag_topic)
    truth, truth_st = load_traj(args.truth, args.bag_topic)
    est, truth = align_by_stamp(est, est_st, truth, truth_st)
    n = len(est)

    result = {
        "frames": n,
        "ate_rmse_m": round(ate_rmse(est, truth, align=not args.no_align), 4),
        "rpe_rmse_m": round(rpe(est, truth, args.rpe_delta), 4),
        "length_m": round(float(np.linalg.norm(
            np.diff(truth[:, 3:6], axis=0), axis=1).sum()), 1),
    }
    print(json.dumps(result))

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        p_e = est[:, 3:6]
        if not args.no_align:
            p_e = align_umeyama(p_e, truth[:, 3:6])
        fig, ax = plt.subplots(figsize=(8, 8))
        ax.plot(truth[:, 3], truth[:, 4], "k-", label="ground truth")
        ax.plot(p_e[:, 0], p_e[:, 1], "r--", label="estimate")
        ax.set_aspect("equal")
        ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        ax.set_title(f"ATE {result['ate_rmse_m']} m over {result['length_m']} m")
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"plot -> {args.plot}", file=sys.stderr)


if __name__ == "__main__":
    main()
