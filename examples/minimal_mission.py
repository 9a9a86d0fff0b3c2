#!/usr/bin/env python
"""Minimal end-to-end mission with the Runner API.

Shows the full surface a user of the reference system would need:
sensor adaptation -> per-scan processing (deskew, registration, keyframes,
IMU fusion, loop closure) -> products (odometry, planning map, height map,
geodetic output, global map export) -> checkpointing.

Run:  python examples/minimal_mission.py
"""

import numpy as np

import jax.numpy as jnp

from lio_slam_tpu.config import Config, RegistrationConfig, StaticConfig
from lio_slam_tpu.io import formats, synthetic
from lio_slam_tpu.pipeline.runner import Runner
from lio_slam_tpu.utils import se3


def main():
    cfg = Config(
        static=StaticConfig(
            max_raw_points=8192, max_scan_points=8192, max_map_points=32768,
            max_keyframes=128, max_keyframe_points=4096,
            max_loop_queue=8, max_gps_queue=8, window_size=16,
            max_imu_window=128),
        registration=RegistrationConfig(),
    )
    runner = Runner(cfg, loop_every=10)

    # stand-in for a live sensor feed: a synthetic drive
    seq = synthetic.make_sequence(n_scans=20, n_points=8192, seed=0)
    g = cfg.imu.gravity
    for i in range(20):
        m = seq.scan_masks[i]
        scan = formats.StandardScan(
            xyz=seq.scans[i][m],
            intensity=np.zeros(int(m.sum()), np.float32),
            ring=np.zeros(int(m.sum()), np.uint16),
            time=np.zeros(int(m.sum()), np.float32),
            stamp=float(seq.stamps[i]))
        if i > 0:
            inc = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                               jnp.asarray(seq.poses[i])))
            T, dtau = 10, 0.01
            imu = {"acc": np.tile([0, 0, g], (T, 1)).astype(np.float32),
                   "gyr": np.tile(inc[:3] / 0.1, (T, 1)).astype(np.float32),
                   "stamps": seq.stamps[i - 1] + np.arange(1, T + 1) * dtau}
        else:
            imu = None
        result = runner.process_scan(scan, imu=imu)
        if result and result.is_keyframe:
            print(f"scan {i:2d}: keyframe #{int(runner.state.store.count):2d} "
                  f"pose [{', '.join(f'{v:+.2f}' for v in result.pose[3:])}] "
                  f"inliers {result.num_inliers}")

    # products
    planning = runner.local_planning_map()
    hm = runner.height_map()
    saved = runner.save_map("/tmp/minimal_mission_maps", resolution=0.4)
    runner.save_checkpoint("/tmp/minimal_mission.ckpt.npz")
    print(f"planning map points: {int(planning.count())}")
    print(f"height map finite cells: "
          f"{int(np.isfinite(np.asarray(hm.elevation)).sum())}")
    print(f"saved: {saved.files}")
    print(f"trajectory length: {len(runner.trajectory)} scans, "
          f"final pose {np.round(runner.trajectory[-1][3:], 2)}")


if __name__ == "__main__":
    main()
