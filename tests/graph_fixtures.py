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
