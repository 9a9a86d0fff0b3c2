"""Fused Pallas correspondence kernel vs the reference XLA path.

The kernel (`ops/fused_corr.py`) must reproduce `find_correspondences` +
`_normal_equations` (mapOptmization.cpp:1618-1784 semantics) exactly: same
5-NN, same plane gates, same robust weights, same 6x6 system.  Runs in
Pallas interpret mode on CPU; the real compile is exercised on TPU by
bench/prof tooling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_slam_tpu.config import RegistrationConfig
from lio_slam_tpu.ops import fused_corr, registration as reg, voxel_grid as vg


def make_scene(seed=0, n_map=4096, n_scan=512):
    rs = np.random.RandomState(seed)
    # planar-ish world: ground plane + wall + noise points
    g = np.stack([rs.uniform(-20, 20, n_map // 2),
                  rs.uniform(-20, 20, n_map // 2),
                  rs.randn(n_map // 2) * 0.01], 1)
    w = np.stack([np.full(n_map // 2, 8.0) + rs.randn(n_map // 2) * 0.01,
                  rs.uniform(-20, 20, n_map // 2),
                  rs.uniform(0, 5, n_map // 2)], 1)
    map_pts = np.concatenate([g, w]).astype(np.float32)
    sel = rs.permutation(n_map)[:n_scan]
    scan = (map_pts[sel] + rs.randn(n_scan, 3) * 0.02).astype(np.float32)
    return map_pts, scan


@pytest.mark.parametrize("halo,cap", [("z", 24), ("xy", 72), ("full", 64), ("none", 24)])
def test_fused_matches_reference(halo, cap):
    map_pts, scan = make_scene()
    N = scan.shape[0]
    cfg = RegistrationConfig(grid_halo=halo, grid_max_per_cell=cap)
    mask = jnp.ones(N, bool)
    mmask = jnp.ones(map_pts.shape[0], bool)
    grid = vg.build_grid(jnp.asarray(map_pts), mmask, cfg.nn_radius,
                         4096, cap, halo=halo)
    pose = jnp.asarray([0.02, -0.01, 0.3, 0.5, -0.2, 0.1], jnp.float32)

    corr = reg.find_correspondences(jnp.asarray(scan), mask, None, None,
                                    pose, cfg, grid=grid)
    AtA_ref, Atb_ref = reg._normal_equations(jnp.asarray(scan), corr, pose)
    n_ref = int(jnp.sum(corr.valid))

    AtA, Atb, n_inl, wsum, wres = fused_corr.fused_normal_equations(
        grid, jnp.asarray(scan), mask, pose, halo=halo,
        nn_radius=cfg.nn_radius, plane_dist_thresh=cfg.plane_dist_thresh,
        robust_weight_floor=cfg.robust_weight_floor, tile=128,
        interpret=True)

    assert int(n_inl) == n_ref
    np.testing.assert_allclose(np.asarray(AtA), np.asarray(AtA_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(Atb), np.asarray(Atb_ref),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(wsum), float(jnp.sum(corr.weight)),
                               rtol=1e-4)
    res_ref = float(jnp.sum(corr.weight * jnp.abs(corr.residual)))
    np.testing.assert_allclose(float(wres), res_ref, rtol=1e-4, atol=1e-4)


def test_fused_respects_scan_mask():
    map_pts, scan = make_scene(seed=3)
    N = scan.shape[0]
    cfg = RegistrationConfig()
    mask = jnp.asarray(np.arange(N) < N // 2)
    grid = vg.build_grid(jnp.asarray(map_pts), jnp.ones(map_pts.shape[0], bool),
                         cfg.nn_radius, 4096, cfg.grid_max_per_cell,
                         halo=cfg.grid_halo)
    pose = jnp.zeros(6, jnp.float32)
    corr = reg.find_correspondences(jnp.asarray(scan), mask, None, None,
                                    pose, cfg, grid=grid)
    _, _, n_inl, _, _ = fused_corr.fused_normal_equations(
        grid, jnp.asarray(scan), mask, pose, halo=cfg.grid_halo,
        nn_radius=cfg.nn_radius, plane_dist_thresh=cfg.plane_dist_thresh,
        robust_weight_floor=cfg.robust_weight_floor, tile=128, interpret=True)
    assert int(n_inl) == int(jnp.sum(corr.valid))
    assert int(n_inl) <= N // 2


def test_gn_loop_with_fused_matches_unfused():
    """Full registration convergence must be identical through the fused
    ne_fn path (interpret mode) and the unfused XLA path."""
    map_pts, scan = make_scene(seed=7, n_map=4096, n_scan=512)
    cfg = RegistrationConfig(max_iterations=8)
    mask = jnp.ones(scan.shape[0], bool)
    grid = vg.build_grid(jnp.asarray(map_pts), jnp.ones(map_pts.shape[0], bool),
                         cfg.nn_radius, 4096, cfg.grid_max_per_cell,
                         halo=cfg.grid_halo)
    init = jnp.asarray([0.01, -0.02, 0.05, 0.3, -0.2, 0.05], jnp.float32)

    res_ref = reg.register_with_grid(jnp.asarray(scan), mask, grid, init, cfg)

    def ne_fn(pose):
        return fused_corr.fused_normal_equations(
            grid, jnp.asarray(scan), mask, pose, halo=cfg.grid_halo,
            nn_radius=cfg.nn_radius, plane_dist_thresh=cfg.plane_dist_thresh,
            robust_weight_floor=cfg.robust_weight_floor, tile=128,
            interpret=True)

    res_fused = reg._gn_loop(jnp.asarray(scan), mask, None, init, cfg,
                             jnp.ones((), bool), 50, ne_fn=ne_fn)
    np.testing.assert_allclose(np.asarray(res_fused.pose),
                               np.asarray(res_ref.pose), atol=1e-4)
    assert int(res_fused.iterations) == int(res_ref.iterations)
    assert bool(res_fused.converged) == bool(res_ref.converged)


def test_fused_empty_map():
    cfg = RegistrationConfig()
    grid = vg.empty_grid(cfg.nn_radius, 1024, cfg.grid_max_per_cell)
    scan = jnp.asarray(np.random.RandomState(0)
                       .uniform(-5, 5, (128, 3)).astype(np.float32))
    AtA, Atb, n_inl, wsum, wres = fused_corr.fused_normal_equations(
        grid, scan, jnp.ones(128, bool), jnp.zeros(6), halo=cfg.grid_halo,
        nn_radius=cfg.nn_radius, plane_dist_thresh=cfg.plane_dist_thresh,
        robust_weight_floor=cfg.robust_weight_floor, tile=128, interpret=True)
    assert int(n_inl) == 0
    assert float(jnp.abs(AtA).sum()) == 0.0
    assert float(jnp.abs(Atb).sum()) == 0.0


def test_from_candidates_held_superset(halo="z", cap=24):
    """corr_refresh_every semantics: the kernel fed a candidate block
    gathered at a NEARBY pose re-selects 5-NN at the evaluation pose and
    matches the fresh-gather system (GN-step-sized pose deltas keep the
    1 m-cell candidate superset intact for virtually every point)."""
    from lio_slam_tpu.utils import se3

    map_pts, scan = make_scene(seed=2)
    N = scan.shape[0]
    cfg = RegistrationConfig(grid_halo=halo, grid_max_per_cell=cap)
    mask = jnp.ones(N, bool)
    grid = vg.build_grid(jnp.asarray(map_pts), jnp.ones(len(map_pts), bool),
                         cfg.nn_radius, 4096, cap, halo=halo)
    pose0 = jnp.asarray([0.02, -0.01, 0.3, 0.5, -0.2, 0.1], jnp.float32)
    # a GN-step-sized move away from the gather pose
    pose1 = pose0 + jnp.asarray([1e-4, -2e-4, 3e-4, 0.004, -0.003, 0.002])

    R0, t0 = se3.pose6_to_Rt(pose0)
    cand, hh = fused_corr.gather_planar(
        grid, se3.transform_points(R0, t0, jnp.asarray(scan)), halo)
    held = fused_corr.fused_ne_from_candidates(
        cand, hh, jnp.asarray(scan), mask, pose1, halo=halo,
        nn_radius=cfg.nn_radius, plane_dist_thresh=cfg.plane_dist_thresh,
        robust_weight_floor=cfg.robust_weight_floor, tile=128, interpret=True)
    fresh = fused_corr.fused_normal_equations(
        grid, jnp.asarray(scan), mask, pose1, halo=halo,
        nn_radius=cfg.nn_radius, plane_dist_thresh=cfg.plane_dist_thresh,
        robust_weight_floor=cfg.robust_weight_floor, tile=128, interpret=True)

    # inlier counts may differ by the rare cell-boundary crosser
    assert abs(int(held[2]) - int(fresh[2])) <= max(2, int(0.01 * N))
    np.testing.assert_allclose(np.asarray(held[0]), np.asarray(fresh[0]),
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(held[1]), np.asarray(fresh[1]),
                               rtol=5e-3, atol=5e-2)
