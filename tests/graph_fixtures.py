"""Deterministic pose-graph fixtures shared by in-process tests and the
multi-process distributed worker (both sides must build bit-identical
inputs)."""

import numpy as np
import jax.numpy as jnp

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.utils import se3


def make_chain_fixture(n: int = 24, K: int = 32, B: int = 64, G: int = 16,
                       seed: int = 42):
    """Odometry chain + prior + a few GPS factors, with noisy initial poses.

    Returns (graph, n).
    """
    rs = np.random.RandomState(seed)
    poses = [np.zeros(6, np.float32)]
    for _ in range(n - 1):
        d = np.array([*(rs.randn(3) * 0.05), 1.0, rs.randn() * 0.3,
                      rs.randn() * 0.05], np.float32)
        poses.append(np.asarray(se3.pose6_compose(jnp.asarray(poses[-1]),
                                                  jnp.asarray(d))))
    true = jnp.asarray(np.stack(poses))
    noisy = true + jnp.asarray(rs.randn(n, 6).astype(np.float32) * 0.03)

    g = F.empty_graph(K, B, G)
    g = g._replace(
        poses=g.poses.at[:n].set(noisy),
        pose_mask=g.pose_mask.at[:n].set(True),
        prior_pose=true[0],
        prior_info=F.info_from_variances([1e-4] * 6),
    )
    info = F.info_from_variances([1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4])
    for i in range(n - 1):
        meas = se3.pose6_between(true[i], true[i + 1])
        g = g._replace(
            bt_i=g.bt_i.at[i].set(i), bt_j=g.bt_j.at[i].set(i + 1),
            bt_meas=g.bt_meas.at[i].set(meas),
            bt_info=g.bt_info.at[i].set(info),
            bt_mask=g.bt_mask.at[i].set(True),
        )
    for s, i in enumerate([5, 12, 19]):
        g = g._replace(
            gps_i=g.gps_i.at[s].set(i),
            gps_meas=g.gps_meas.at[s].set(true[i, 3:]),
            gps_info=g.gps_info.at[s].set(jnp.full(3, 1e4)),
            gps_mask=g.gps_mask.at[s].set(True))
    return g, n


def make_loop_graph_fixture(K: int = 2048, n_loops: int = 8, seed: int = 0):
    """The production-scale loop graph (the dryrun/bench K=2048 shape):
    noisy straight chain + long-lever-arm loop factors i <-> i+K/4 with a
    translation-soft prior.  Returns (graph, truth (K, 6))."""
    rs = np.random.RandomState(seed)
    poses = np.zeros((K, 6), np.float32)
    poses[:, 3] = np.arange(K)
    poses += rs.randn(K, 6).astype(np.float32) * 0.02
    B = (K - 1) + 64
    meas = np.tile(np.array([0, 0, 0, 1, 0, 0], np.float32), (B, 1))
    bt_i = np.concatenate([np.arange(K - 1), np.zeros(65, np.int64)])[:B]
    bt_j = np.concatenate([np.arange(1, K), np.zeros(65, np.int64)])[:B]
    bt_mask = np.zeros(B, bool)
    bt_mask[:K - 1] = True
    span = K // 4
    for q in range(n_loops):
        s = (K - 1) + q
        i = q * (K // 16)
        bt_i[s], bt_j[s] = i, i + span
        meas[s] = [0, 0, 0, float(span), 0, 0]
        bt_mask[s] = True
    info = np.tile(np.asarray(F.info_from_variances(
        (1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4))), (B, 1))
    g = F.empty_graph(K, B, 64)._replace(
        poses=jnp.asarray(poses), pose_mask=jnp.ones(K, bool),
        prior_pose=jnp.asarray(poses[0]),
        prior_info=F.info_from_variances(
            (1e-2, 1e-2, np.pi ** 2, 1e8, 1e8, 1e8)),
        bt_i=jnp.asarray(bt_i, jnp.int32), bt_j=jnp.asarray(bt_j, jnp.int32),
        bt_meas=jnp.asarray(meas), bt_info=jnp.asarray(info, jnp.float32),
        bt_mask=jnp.asarray(bt_mask))
    truth = np.zeros((K, 6), np.float32)
    truth[:, 3] = np.arange(K)
    return g, truth
