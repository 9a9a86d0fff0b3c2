"""Per-rig accuracy table on the HARD synthetic benchmark.

The reference's validation regime is a 12-bag qualitative test log
(README.md:220-283: per-bag "ok"/failure judgments per rig).  Real bags
cannot exist in this environment, so this is the quantitative equivalent
(round-3 verdict weak #4 / next #6): every shipped rig preset replayed over
the HARD synthetic world — 2% outlier returns, range-growing noise,
vegetation scatter, a moving object — scoring ATE and RPE against ground
truth with the whole pipeline on device (deskew + front-end guesses +
mapping + loop cadence; no oracle inputs).

    python tools/rig_ate_table.py [--scans 60] [--rigs 6t,kitti,...]
                                  [--easy] [--json out.json]

Shapes are unified across rigs (one StaticConfig) so results differ only by
the rigs' real parameters: lidar ranges/filters, IMU noise/extrinsics, leaf
sizes, GN gates, loop settings.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# --cpu must win before ANY backend initialization (the axon sitecustomize
# programmatically forces jax_platforms, so this must run first — the same
# ordering tests/conftest.py uses)
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from lio_slam_tpu.config import PRESETS, StaticConfig
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.pipeline import imu_frontend as fe
from lio_slam_tpu.pipeline import lio, replay
from lio_slam_tpu.utils import se3
from tools.eval_trajectory import rpe as rpe_trans_fn


def rpe_rot(est: np.ndarray, truth: np.ndarray, delta: int = 10) -> float:
    """Rotation RPE (deg RMSE over delta-frame yaw increments)."""
    errs = []
    for i in range(len(est) - delta):
        de = est[i + delta, :3] - est[i, :3]
        dt = truth[i + delta, :3] - truth[i, :3]
        d = (de - dt + np.pi) % (2 * np.pi) - np.pi
        errs.append(np.linalg.norm(d))
    errs = np.asarray(errs)
    return float(np.rad2deg(np.sqrt((errs * errs).mean()))) if len(errs) else 0.0

STATIC = StaticConfig(
    max_raw_points=32768, max_scan_points=8192, max_map_points=65536,
    max_keyframes=256, max_keyframe_points=8192,
    max_loop_queue=8, max_gps_queue=8, window_size=32, max_imu_window=64)


def run_rig(name: str, seq, n: int, loop_every: int = 10):
    cfg = dataclasses.replace(PRESETS[name](), static=STATIC)
    W = STATIC.max_imu_window
    acc, gyr, dts, rel_t, imask = synthetic.make_imu_windows(
        seq, W, samples_per_scan=10, gravity=cfg.imu.gravity)
    P = STATIC.max_raw_points
    batch = replay.ReplayBatch(
        xyz=jnp.asarray(seq.scans[:n]),
        ptime=jnp.zeros((n, P), jnp.float32),
        pmask=jnp.asarray(seq.scan_masks[:n]),
        ring=jnp.zeros((n, P), jnp.int32),
        acc=jnp.asarray(acc[:n]), gyr=jnp.asarray(gyr[:n]),
        dts=jnp.asarray(dts[:n]), rel_t=jnp.asarray(rel_t[:n]),
        imask=jnp.asarray(imask[:n]), stamp=jnp.asarray(seq.stamps[:n]))
    cr = replay.HostDrivenReplay(cfg, loop_every=loop_every)
    chunks = cr.split(batch)
    t0 = time.time()
    state, fes = cr.init()
    _, _, outs = cr.run(state, fes, chunks)
    poses = np.asarray(outs.poses)
    elapsed = time.time() - t0
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                                 jnp.asarray(p)))
                    for p in seq.poses[:n]])
    ate = synthetic.ate_rmse(poses, rel)
    rpe_t = rpe_trans_fn(poses, rel, delta=10)
    rpe_r = rpe_rot(poses, rel, delta=10)
    return {"rig": name, "ate_m": round(float(ate), 4),
            "rpe_trans_m": round(float(rpe_t), 4),
            "rpe_rot_deg": round(float(rpe_r), 4),
            "mean_gn_iters": round(float(np.asarray(outs.iters)[1:].mean()), 2),
            "finite": bool(np.isfinite(poses).all()),
            "wall_s": round(elapsed, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=60)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--rigs", default=None,
                    help="comma list (default: all presets)")
    ap.add_argument("--easy", action="store_true",
                    help="clean world (regression mode) instead of hard")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (accuracy numbers are "
                         "backend-independent; use when the TPU is busy)")
    args = ap.parse_args()   # --cpu already applied at import time
    rigs = args.rigs.split(",") if args.rigs else sorted(PRESETS)

    hard = {} if args.easy else dict(outlier_frac=0.02, range_noise=0.05,
                                     n_scatter=20000, moving_object=True)
    seq = synthetic.make_sequence(n_scans=args.scans, n_points=args.points,
                                  seed=0, speed=2.0, **hard)
    rows = []
    for rig in rigs:
        try:
            rows.append(run_rig(rig, seq, args.scans))
        except Exception as e:  # a rig failing must not kill the table
            rows.append({"rig": rig, "error": f"{type(e).__name__}: {e}"[:120]})
        r = rows[-1]
        print(json.dumps(r), flush=True)
    print(f"\n{'rig':>18s} {'ATE[m]':>8s} {'RPEt[m]':>8s} {'RPEr[deg]':>9s} "
          f"{'GN-it':>6s}")
    for r in rows:
        if "error" in r:
            print(f"{r['rig']:>18s} ERROR {r['error']}")
        else:
            print(f"{r['rig']:>18s} {r['ate_m']:8.4f} {r['rpe_trans_m']:8.4f} "
                  f"{r['rpe_rot_deg']:9.4f} {r['mean_gn_iters']:6.2f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"world": "easy" if args.easy else "hard",
                       "scans": args.scans, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
