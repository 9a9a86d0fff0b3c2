"""Deterministic registration scene shared by the distributed worker and
its in-process reference (both sides must build identical inputs)."""

import numpy as np
import jax.numpy as jnp

from lio_slam_tpu.utils import se3


def make_register_fixture(n_map: int = 4096, n_scan: int = 512,
                          seed: int = 1):
    rs = np.random.RandomState(seed)
    u = lambda n, lo, hi: rs.uniform(lo, hi, n).astype(np.float32)
    npl = n_map // 4
    world = np.concatenate([
        np.stack([u(2 * npl, -20, 20), u(2 * npl, -20, 20),
                  np.zeros(2 * npl, np.float32)], 1),
        np.stack([np.full(npl, 15.0, np.float32),
                  u(npl, -20, 20), u(npl, 0, 6)], 1),
        np.stack([u(npl, -20, 20), np.full(npl, -12.0, np.float32),
                  u(npl, 0, 6)], 1),
    ]) + rs.randn(n_map, 3).astype(np.float32) * 0.005
    scan_world = world[rs.choice(n_map, n_scan, replace=False)]
    true_pose = np.array([0.02, -0.01, 0.03, 0.2, -0.1, 0.05], np.float32)
    R, t = se3.pose6_to_Rt(jnp.asarray(true_pose))
    scan_body = np.asarray(
        se3.transform_points(R.T, -R.T @ t, jnp.asarray(scan_world)))
    return world, scan_body, true_pose
