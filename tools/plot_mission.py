#!/usr/bin/env python
"""GPS-vs-fusion trajectory overlay from a recorded mission bag.

Replaces the reference's live plotting scripts
(`src/liorf/scripts/plot_trajectory.py:22-58` and `realtime_plot.py`): those
subscribe GpswithHeading topics and draw raw GPS against the fused output in
a UTM-like local projection.  Here we read the same records from a bag
written by `Runner(record_bag=...)` (or a reference recording) and overlay:

    python tools/plot_mission.py mission.bag --out overlay.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lio_slam_tpu.io import rosbag as rb          # noqa: E402
from lio_slam_tpu.utils import enu as enu_mod     # noqa: E402


def collect(path: str, odom_topic: str, gps_topics: list):
    """Returns {topic: (T, 2) local-xy} + odometry xy."""
    reader = rb.BagReader(path)
    odom_xy = []
    gps_fixes = {t: [] for t in gps_topics}
    for m in reader.read_messages([odom_topic] + gps_topics):
        if m.topic == odom_topic:
            od = rb.decode_odometry(m.raw)
            odom_xy.append(od.position[:2])
        else:
            msg = rb.decode_message(m.msg_type, m.raw)
            fix = getattr(msg, "gps", msg)   # GpswithHeading nests a NavSatFix
            lat = getattr(fix, "latitude", None)
            if lat is not None:
                gps_fixes[m.topic].append(
                    (fix.latitude, fix.longitude, getattr(fix, "altitude", 0.0)))
    # anchor the ENU frame at the first fix seen (plot_trajectory.py uses the
    # first message as the local origin)
    tracks = {}
    datum = None
    for t, fixes in gps_fixes.items():
        if not fixes:
            continue
        if datum is None:
            datum = fixes[0]
        lc = enu_mod.LocalCartesian(*datum)
        tracks[t] = np.asarray([lc.forward(*f)[:2] for f in fixes])
    return np.asarray(odom_xy), tracks


def collect_log(path: str):
    """Parse a Runner mission log (JSONL): per-step poses, keyframe
    positions by GLOBAL id, and accepted-loop events (the recorded
    equivalent of the reference's rviz loop-constraint markers,
    mapOptmization.cpp:1385-1436)."""
    poses, kf_xy, loops = [], [], []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("event") == "loop":
                loops.append(rec)
            elif "pose" in rec:
                poses.append(rec["pose"][3:5])
                if rec.get("keyframe"):
                    # the g-th keyframe record in stream order IS gid g
                    kf_xy.append(rec["pose"][3:5])
    return np.asarray(poses), np.asarray(kf_xy), loops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag", nargs="?")
    ap.add_argument("--odom-topic", default="/liorf/mapping/odometry")
    ap.add_argument("--gps-topics", nargs="*",
                    default=["/liorf/gpsdata", "/gpsdata", "/gps/fix"])
    ap.add_argument("--mission-log", default=None,
                    help="Runner JSONL mission log: overlays the trajectory "
                         "and draws accepted-loop chords colored by source")
    ap.add_argument("--out", default="mission_overlay.png")
    args = ap.parse_args()
    if args.bag is None and args.mission_log is None:
        ap.error("need a bag and/or --mission-log")

    odom_xy = np.zeros((0, 2))
    tracks = {}
    if args.bag:
        odom_xy, tracks = collect(args.bag, args.odom_topic, args.gps_topics)
    log_xy, kf_xy, loops = (np.zeros((0, 2)), np.zeros((0, 2)), [])
    if args.mission_log:
        log_xy, kf_xy, loops = collect_log(args.mission_log)
    summary = {"odometry_poses": len(odom_xy),
               **{t: len(v) for t, v in tracks.items()}}
    if args.mission_log:
        summary.update({"log_steps": len(log_xy), "keyframes": len(kf_xy),
                        "loop_events": len(loops)})
    print(json.dumps(summary))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(odom_xy):
        ax.plot(odom_xy[:, 0], odom_xy[:, 1], "k-", lw=1.5, label=args.odom_topic)
    for t, xy in tracks.items():
        ax.plot(xy[:, 0], xy[:, 1], ".", ms=3, label=t)
    if len(log_xy):
        ax.plot(log_xy[:, 0], log_xy[:, 1], "b-", lw=1.0, alpha=0.7,
                label="mission log")
    # loop chords: a line between the matched keyframe pair, by source
    src_color = {"rs": "tab:green", "sc": "tab:orange",
                 "archive": "tab:red", "injected": "tab:purple"}
    seen_src = set()
    for ev in loops:
        i, j = int(ev["i"]), int(ev["j"])
        if i < len(kf_xy) and j < len(kf_xy):
            c = src_color.get(ev.get("source", "sc"), "gray")
            lbl = (f"loop:{ev['source']}"
                   if ev.get("source") not in seen_src else None)
            seen_src.add(ev.get("source"))
            ax.plot([kf_xy[i][0], kf_xy[j][0]], [kf_xy[i][1], kf_xy[j][1]],
                    "-", color=c, lw=1.2, alpha=0.8, label=lbl)
    ax.set_aspect("equal")
    ax.set_xlabel("east [m]")
    ax.set_ylabel("north [m]")
    ax.legend()
    ax.set_title(os.path.basename(args.bag or args.mission_log))
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"plot -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
