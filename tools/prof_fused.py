"""TPU timing: fused Pallas correspondence kernel vs the unfused XLA path.

Same harness discipline as prof_stage.py: REPS iterations inside one jit via
fori_loop with data-dependency threading (single dispatches disappear into
the ~26 ms tunnel round-trip)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from lio_slam_tpu.config import RegistrationConfig
from lio_slam_tpu.ops import fused_corr, registration as reg, voxel_grid as vg

N = 8192
M = 65536
REPS = 30

rng = np.random.default_rng(0)
map_pts = jnp.asarray(rng.uniform(-40, 40, (M, 3)).astype(np.float32))
map_mask = jnp.ones(M, bool)
scan = jnp.asarray(rng.uniform(-30, 30, (N, 3)).astype(np.float32))
scan_mask = jnp.ones(N, bool)
pose = jnp.asarray([0.02, -0.01, 0.3, 0.5, -0.2, 0.1], jnp.float32)


def timeit(name, fn, n=3, reps=REPS):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/reps*1e3:8.3f} ms/iter   ({best*1e3:7.1f} ms /{reps})",
          flush=True)


def loop(body):
    @jax.jit
    def run():
        return lax.fori_loop(0, REPS, lambda i, c: body(c), jnp.float32(0))
    return run


for halo, cap in [("z", 24), ("full", 64), ("full", 128)]:
    cfg = RegistrationConfig(grid_halo=halo, grid_max_per_cell=cap)
    grid = vg.build_grid(map_pts, map_mask, cfg.nn_radius,
                         cfg.grid_table_size, cap, halo=halo)
    jax.block_until_ready(grid)

    def fused_body(carry, grid=grid, halo=halo, cfg=cfg):
        p = pose.at[3].add(carry * 1e-9)
        AtA, Atb, n, ws, wr = fused_corr.fused_normal_equations(
            grid, scan, scan_mask, p, halo=halo, nn_radius=cfg.nn_radius,
            plane_dist_thresh=cfg.plane_dist_thresh,
            robust_weight_floor=cfg.robust_weight_floor)
        return carry + AtA.sum() + Atb.sum() + ws

    def unfused_body(carry, grid=grid, cfg=cfg):
        p = pose.at[3].add(carry * 1e-9)
        c = reg.find_correspondences(scan, scan_mask, None, None, p, cfg,
                                     grid=grid)
        H, b = reg._normal_equations(scan, c, p)
        return carry + H.sum() + b.sum()

    # correctness probe on-device first
    AtA, Atb, n, ws, wr = fused_corr.fused_normal_equations(
        grid, scan, scan_mask, pose, halo=halo, nn_radius=cfg.nn_radius,
        plane_dist_thresh=cfg.plane_dist_thresh,
        robust_weight_floor=cfg.robust_weight_floor)
    c = reg.find_correspondences(scan, scan_mask, None, None, pose, cfg,
                                 grid=grid)
    H, b = reg._normal_equations(scan, c, pose)
    n_ref = int(jnp.sum(c.valid))
    err = float(jnp.max(jnp.abs(AtA - H)) / (1e-6 + jnp.max(jnp.abs(H))))
    print(f"[{halo} C={cap}] inliers fused={int(n)} ref={n_ref} "
          f"relerr(AtA)={err:.2e}", flush=True)

    timeit(f"fused kernel ({halo}, C={cap})", loop(fused_body))
    timeit(f"unfused corr+NE ({halo}, C={cap})", loop(unfused_body))
