"""Sharded sparse pose-graph solve (parallel/sparse.py): parity with the
single-device block-tridiagonal+Woodbury backend at production K."""

import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.graph import sparse as sp
from lio_slam_tpu.parallel import mesh as mesh_mod
from lio_slam_tpu.parallel import sparse as psp


def make_loop_graph(K: int, n_loops: int = 8, seed: int = 0):
    """Straight-line odometry chain with noise + long-range loop factors —
    the bench.py part-3 production-shape graph."""
    rs = np.random.RandomState(seed)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 3] = np.arange(K) * 1.0
    poses += rs.randn(K, 6).astype(np.float32) * 0.02
    B = (K - 1) + 64
    g = F.empty_graph(K, B, 64)
    meas = np.tile(np.array([0, 0, 0, 1, 0, 0], np.float32), (B, 1))
    bt_i = np.concatenate([np.arange(K - 1), np.zeros(65, np.int64)])[:B]
    bt_j = np.concatenate([np.arange(1, K), np.zeros(65, np.int64)])[:B]
    bt_mask = np.zeros(B, bool)
    bt_mask[:K - 1] = True
    span = K // 4
    for q in range(n_loops):
        s = (K - 1) + q
        i = (q * K // (n_loops + 1)) % (K - span)
        bt_i[s], bt_j[s] = i, i + span
        meas[s] = [0, 0, 0, float(span), 0, 0]
        bt_mask[s] = True
    info = np.tile(np.asarray(F.info_from_variances(
        (1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4))), (B, 1))
    g = g._replace(
        poses=jnp.asarray(poses), pose_mask=jnp.ones(K, bool),
        prior_pose=jnp.asarray(poses[0]),
        prior_info=F.info_from_variances(
            (1e-2, 1e-2, np.pi ** 2, 1e8, 1e8, 1e8)),
        bt_i=jnp.asarray(bt_i, jnp.int32), bt_j=jnp.asarray(bt_j, jnp.int32),
        bt_meas=jnp.asarray(meas), bt_info=jnp.asarray(info, jnp.float32),
        bt_mask=jnp.asarray(bt_mask))
    # a few GPS factors
    for s, i in enumerate(range(0, K, max(K // 8, 1))):
        g = g._replace(
            gps_i=g.gps_i.at[s].set(i),
            gps_meas=g.gps_meas.at[s].set(jnp.asarray(
                [poses[i, 3], poses[i, 4], poses[i, 5]])),
            gps_info=g.gps_info.at[s].set(jnp.full(3, 100.0)),
            gps_mask=g.gps_mask.at[s].set(True))
    return g


@pytest.mark.parametrize("K", [64, 256])
def test_sharded_matches_single_device(K):
    g = make_loop_graph(K)
    mesh = mesh_mod.make_mesh(8)
    solve = psp.make_sharded_sparse_solver(mesh)
    ref = sp.solve_sparse(g, iterations=3).graph.poses
    got = solve(g, iterations=3).graph.poses
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_no_loops_chain_only():
    g = make_loop_graph(64, n_loops=0)
    mesh = mesh_mod.make_mesh(4)
    solve = psp.make_sharded_sparse_solver(mesh)
    ref = sp.solve_sparse(g, iterations=3).graph.poses
    got = solve(g, iterations=3).graph.poses
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_2d_mesh_staged():
    """('slice', 'data') mesh: assembly reduced ICI-first then across
    slices — same numbers, different collective staging."""
    from lio_slam_tpu.parallel import multislice as ms
    g = make_loop_graph(64)
    mesh = ms.make_multislice_mesh(2, 4)
    solve = psp.make_sharded_sparse_solver(mesh, axes=("slice", "data"))
    ref = sp.solve_sparse(g, iterations=2).graph.poses
    got = solve(g, iterations=2).graph.poses
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_sharded_production_k2048():
    """The round-3 gap itself: K=2048 with loop factors on the 8-device
    mesh — dense per-device assembly would be ~600 MB; this must run and
    match the single-device sparse backend.

    Parity notes (measured): the chain-only path agrees to 6e-8; with loop
    factors active the two differ by ~2e-2 from float32 reduction-order
    noise in the (6L)² Woodbury S-solve (S carries 1e8 entries for masked
    loop rows), while BOTH land ~0.09 from ground truth (sharded marginally
    closer).  So the gates are: exact chain parity, loop-case agreement at
    float32-noise scale, and equal distance-to-optimum."""
    mesh = mesh_mod.make_mesh(8)
    solve = psp.make_sharded_sparse_solver(mesh)

    # chain-only: bitwise-grade parity
    g0 = make_loop_graph(2048, n_loops=0)
    ref0 = sp.solve_sparse(g0, iterations=2).graph.poses
    got0 = solve(g0, iterations=2).graph.poses
    assert np.abs(np.asarray(got0) - np.asarray(ref0)).max() < 1e-4

    # with loops: same optimum, float32-noise disagreement bound
    g = make_loop_graph(2048)
    ref = np.asarray(sp.solve_sparse(g, iterations=5).graph.poses)
    got = np.asarray(solve(g, iterations=5).graph.poses)
    assert np.abs(got - ref).max() < 5e-2
    truth = np.zeros((2048, 6), np.float32)
    truth[:, 3] = np.arange(2048)
    d_ref = np.abs(ref - truth).max()
    d_got = np.abs(got - truth).max()
    assert d_got <= d_ref * 1.1 + 1e-3, (d_got, d_ref)
