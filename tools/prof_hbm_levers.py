"""HBM-headroom levers for the fused correspondence kernel (round-4 verdict
next #2: 'spend the 98% of HBM headroom' — or measure why each lever loses).

The fused call's cost is the candidate fetch: per query, O=9 bucket rows of
C slots x 12 B (the z-halo layout).  Three competing hypotheses:

  (a) BYTES-bound: time scales with C -> packing (f16) or narrower rows win;
  (b) DESCRIPTOR-bound: time scales with O x N (row count), flat in C ->
      only fewer rows per query helps (halo=full: 1 row, but 27x inserts —
      measured loss end-to-end in round 4);
  (c) intermediate-trip-bound: the XLA gather materializes (O, N, 3C) to
      HBM and the Pallas kernel reads it back — candidates move TWICE.

This tool measures, on the real chip:
  1. fused_normal_equations time vs C (bucket capacity) at fixed N, map;
  2. fused time vs tile size;
  3. the bare XLA bucket gather vs the full fused call (isolates the
     candidate fetch from the kernel compute);
  4. end-to-end step replay scans/s + drift at the candidate C values
     (recall changes with C — speed means nothing if registration degrades).

    python tools/prof_hbm_levers.py [--cpu]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax import lax

from lio_slam_tpu.config import Config, RegistrationConfig, StaticConfig
from lio_slam_tpu.ops import fused_corr, voxel_grid as vg


def timeit(fn, reps=3):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def fused_time(C, tile=512, N=8192, M=65536, reps=30):
    rng = np.random.default_rng(0)
    cfg = RegistrationConfig(grid_max_per_cell=C)
    map_pts = jnp.asarray(rng.uniform(-40, 40, (M, 3)).astype(np.float32))
    scan = jnp.asarray(rng.uniform(-30, 30, (N, 3)).astype(np.float32))
    grid = vg.build_grid(map_pts, jnp.ones(M, bool), cfg.nn_radius,
                         cfg.grid_table_size, C, halo=cfg.grid_halo)
    pose = jnp.asarray([0.02, -0.01, 0.3, 0.5, -0.2, 0.1], jnp.float32)

    @jax.jit
    def run_fused():
        def body(i, carry):
            p = pose.at[3].add(carry * 1e-9)
            AtA, Atb, n, ws, wr = fused_corr.fused_normal_equations(
                grid, scan, jnp.ones(N, bool), p, halo=cfg.grid_halo,
                nn_radius=cfg.nn_radius, tile=tile,
                plane_dist_thresh=cfg.plane_dist_thresh,
                robust_weight_floor=cfg.robust_weight_floor)
            return carry + AtA.sum() + Atb.sum() + ws
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    @jax.jit
    def run_gather():
        from lio_slam_tpu.utils import se3
        def body(i, carry):
            p = pose.at[3].add(carry * 1e-9)
            Rm, t = se3.pose6_to_Rt(p)
            scan_w = se3.transform_points(Rm, t, scan)
            cand, hh = fused_corr.gather_planar(grid, scan_w, cfg.grid_halo)
            return carry + cand[0, 0] + cand[-1, -1] + hh.sum().astype(jnp.float32) * 1e-9
        return lax.fori_loop(0, reps, body, jnp.float32(0))

    t_fused = timeit(run_fused) / reps
    t_gather = timeit(run_gather) / reps
    cells = 9
    bytes_1trip = N * cells * C * 12
    return {"C": C, "tile": tile,
            "fused_ms": round(t_fused * 1e3, 4),
            "gather_only_ms": round(t_gather * 1e3, 4),
            "gbps_1trip": round(bytes_1trip / t_fused / 1e9, 1)}


def e2e_at_C(C, n_scans=60):
    """Step-replay scans/s + drift with the bucket capacity C."""
    from lio_slam_tpu.io import synthetic
    from lio_slam_tpu.pipeline import lio
    from lio_slam_tpu.utils import pointcloud as pc, se3

    cfg = Config(
        static=StaticConfig(
            max_raw_points=32768, max_scan_points=8192, max_map_points=65536,
            max_keyframes=256, max_keyframe_points=8192,
            max_loop_queue=8, max_gps_queue=8, window_size=32,
            max_imu_window=64),
        registration=RegistrationConfig(corr_refresh_every=2,
                                        grid_max_per_cell=C))
    seq = synthetic.make_sequence(n_scans=n_scans, n_points=32768, seed=0,
                                  speed=2.0)
    step = lio.make_lio_step(cfg)
    incs = np.stack([np.asarray(se3.pose6_between(
        jnp.asarray(seq.poses[max(i - 1, 0)]), jnp.asarray(seq.poses[i])))
        for i in range(n_scans)])
    batched = lio.ScanInput(
        cloud=pc.Cloud(xyz=jnp.asarray(seq.scans),
                       mask=jnp.asarray(seq.scan_masks)),
        stamp=jnp.asarray(seq.stamps), init_guess=jnp.asarray(incs),
        guess_valid=jnp.asarray(np.arange(n_scans) > 0),
        imu_rpy=jnp.asarray(seq.imu_rpy),
        imu_available=jnp.ones(n_scans, bool),
        gps_pos=jnp.zeros((n_scans, 3)), gps_info=jnp.zeros((n_scans, 3)),
        gps_valid=jnp.zeros(n_scans, bool))

    @jax.jit
    def replay(state, batched):
        def body(st, inp):
            guess = se3.pose6_compose(st.pose, inp.init_guess)
            st, out = step(st, inp._replace(init_guess=guess))
            return st, out.pose
        return jax.lax.scan(body, state, batched)

    fresh = jax.jit(lambda: lio.init_state(cfg))
    state, poses = jax.block_until_ready(replay(fresh(), batched))
    best = float("inf")
    for _ in range(3):
        st = fresh()
        t0 = time.time()
        st, poses = jax.block_until_ready(replay(st, batched))
        best = min(best, time.time() - t0)
    final = np.asarray(poses[-1])
    rel_t = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                         jnp.asarray(seq.poses[n_scans - 1])))
    drift = float(np.linalg.norm(final[3:] - rel_t[3:]))
    return {"C": C, "scans_per_sec": round(n_scans / best, 1),
            "drift_m": round(drift, 4)}


def main():
    print("# part 1: fused call + bare gather vs bucket capacity C", flush=True)
    for C in (8, 12, 16, 24, 32, 40):
        print(json.dumps(fused_time(C)), flush=True)
    print("# part 2: tile size at C=24", flush=True)
    for tile in (256, 512, 1024, 2048):
        print(json.dumps(fused_time(24, tile=tile)), flush=True)
    print("# part 3: end-to-end step replay vs C", flush=True)
    for C in (12, 16, 24):
        print(json.dumps(e2e_at_C(C)), flush=True)


if __name__ == "__main__":
    main()
