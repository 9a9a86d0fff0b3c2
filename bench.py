"""End-to-end benchmark: full per-scan LIO step throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference claims "up to 10x faster than real-time" for its
10 Hz pipeline (README.md:79, BASELINE.md) => 100 scans/s.  `vs_baseline`
is our scans/s divided by that.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from lio_slam_tpu.config import Config, RegistrationConfig, StaticConfig
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.pipeline import lio
from lio_slam_tpu.utils import pointcloud as pc, se3


def bench_config() -> Config:
    """Production-ish shapes: ~8k registered points vs a 64k-point local map
    (what a 16-to-80-beam scan looks like after the reference's 0.4 m voxel
    downsample)."""
    return Config(
        static=StaticConfig(
            max_raw_points=32768, max_scan_points=8192, max_map_points=65536,
            max_keyframes=256, max_keyframe_points=8192,
            max_loop_queue=8, max_gps_queue=8, window_size=32),
        registration=RegistrationConfig(),
    )


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    cfg = bench_config()
    seq = synthetic.make_sequence(n_scans=n_scans, n_points=32768, seed=0,
                                  speed=2.0)
    step = lio.make_lio_step(cfg)
    state = lio.init_state(cfg)

    def make_input(i, guess, gvalid):
        return lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[i]),
                           mask=jnp.asarray(seq.scan_masks[i])),
            stamp=jnp.float32(seq.stamps[i]),
            init_guess=jnp.asarray(guess),
            guess_valid=jnp.asarray(gvalid),
            imu_rpy=jnp.asarray(seq.imu_rpy[i]),
            imu_available=jnp.asarray(True),
            gps_pos=jnp.zeros(3), gps_info=jnp.zeros(3),
            gps_valid=jnp.asarray(False))

    # warmup: scans 0-2 (compiles both keyframe and non-keyframe branches)
    prev = np.zeros(6, np.float32)
    t_start = None
    n_timed = 0
    for i in range(n_scans):
        if i == 0:
            guess, gvalid = np.zeros(6, np.float32), False
        else:
            inc = se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                    jnp.asarray(seq.poses[i]))
            guess = np.asarray(se3.pose6_compose(jnp.asarray(prev), inc))
            gvalid = True
        state, out = step(state, make_input(i, guess, gvalid))
        out = jax.block_until_ready(out)
        prev = np.asarray(out.pose)
        if i == 2:
            t_start = time.time()
        elif i > 2:
            n_timed += 1
    elapsed = time.time() - t_start
    scans_per_sec = n_timed / elapsed

    # sanity: trajectory must track (est frame anchored at first pose)
    rel_t = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                         jnp.asarray(seq.poses[n_scans - 1])))
    drift = float(np.linalg.norm(prev[3:] - rel_t[3:]))
    if not np.isfinite(prev).all() or drift > 2.0:
        print(json.dumps({"metric": "scans_per_sec", "value": 0.0,
                          "unit": "scans/s", "vs_baseline": 0.0,
                          "error": f"diverged drift={drift:.2f}"}))
        return

    print(json.dumps({
        "metric": "scans_per_sec",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
