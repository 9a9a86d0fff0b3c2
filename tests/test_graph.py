import jax
import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.graph import solver
from lio_slam_tpu.utils import se3


K, B, G = 32, 64, 16


def chain_graph(true_poses, noisy_poses, odom_info=None):
    """Build a graph with prior on pose0 + odometry chain from true poses."""
    n = true_poses.shape[0]
    g = F.empty_graph(K, B, G)
    g = g._replace(
        poses=g.poses.at[:n].set(noisy_poses),
        pose_mask=g.pose_mask.at[:n].set(True),
        prior_pose=true_poses[0],
        prior_info=F.info_from_variances([1e-4] * 6),
    )
    info = odom_info if odom_info is not None else F.info_from_variances(
        [1e-6, 1e-6, 1e-6, 1e-4, 1e-4, 1e-4])
    for i in range(n - 1):
        meas = se3.pose6_between(true_poses[i], true_poses[i + 1])
        g = g._replace(
            bt_i=g.bt_i.at[i].set(i), bt_j=g.bt_j.at[i].set(i + 1),
            bt_meas=g.bt_meas.at[i].set(meas),
            bt_info=g.bt_info.at[i].set(info),
            bt_mask=g.bt_mask.at[i].set(True),
        )
    return g


def rand_traj(n, seed=0, step=1.0):
    rs = np.random.RandomState(seed)
    poses = [np.zeros(6, np.float32)]
    for _ in range(n - 1):
        d = np.array([*(rs.randn(3) * 0.05), step, rs.randn() * 0.3, rs.randn() * 0.05],
                     np.float32)
        poses.append(np.asarray(se3.pose6_compose(jnp.asarray(poses[-1]), jnp.asarray(d))))
    return jnp.asarray(np.stack(poses))


class TestErrors:
    def test_between_error_zero_at_truth(self):
        a = jnp.array([0.1, -0.2, 0.3, 1.0, 2.0, 3.0])
        b = jnp.array([0.2, 0.1, -0.4, 2.0, 1.0, 2.5])
        meas = se3.pose6_between(a, b)
        e = F.between_error(a, b, F.Z6(), F.Z6(), meas)
        np.testing.assert_allclose(e, np.zeros(6), atol=1e-5)

    def test_gps_error(self):
        p = jnp.array([0.0, 0, 0, 1.0, 2.0, 3.0])
        e = F.gps_error(p, F.Z6(), jnp.array([1.0, 2.0, 2.0]))
        np.testing.assert_allclose(e, [0, 0, 1.0], atol=1e-6)

    def test_cauchy_weight(self):
        assert float(F.cauchy_weight(jnp.asarray(0.0))) == 1.0
        assert float(F.cauchy_weight(jnp.asarray(100.0))) < 0.01


class TestSolver:
    def test_chain_converges_to_truth(self):
        true = rand_traj(10)
        rs = np.random.RandomState(1)
        noisy = true + jnp.asarray(rs.randn(10, 6).astype(np.float32) * 0.05)
        noisy = noisy.at[0].set(true[0])
        g = chain_graph(true, noisy)
        res = solver.solve(g, g.pose_mask, iterations=3)
        err = np.array(res.graph.poses[:10] - true)
        # wrap angle diffs
        err[:, :3] = (err[:, :3] + np.pi) % (2 * np.pi) - np.pi
        assert np.abs(err).max() < 1e-3, err

    def test_inactive_poses_fixed(self):
        true = rand_traj(10)
        rs = np.random.RandomState(2)
        noisy = true + jnp.asarray(rs.randn(10, 6).astype(np.float32) * 0.05)
        g = chain_graph(true, noisy)
        act = solver.window_mask(g.pose_mask, jnp.int32(10), 4)  # last 4 free
        res = solver.solve(g, act, iterations=3)
        np.testing.assert_allclose(res.graph.poses[:6], noisy[:6], atol=1e-6)
        assert not np.allclose(res.graph.poses[6:10], noisy[6:10], atol=1e-6)

    def test_gps_pulls_position(self):
        true = rand_traj(6)
        g = chain_graph(true, true)
        # GPS says keyframe 5 is 1 m east of where odometry puts it
        target = true[5, 3:] + jnp.array([1.0, 0.0, 0.0])
        g = g._replace(
            gps_i=g.gps_i.at[0].set(5),
            gps_meas=g.gps_meas.at[0].set(target),
            gps_info=g.gps_info.at[0].set(jnp.full(3, 1e4)),
            gps_mask=g.gps_mask.at[0].set(True),
        )
        res = solver.solve(g, g.pose_mask, iterations=5)
        moved = np.asarray(res.graph.poses[5, 3:] - true[5, 3:])
        assert moved[0] > 0.5  # pulled strongly toward GPS

    def test_loop_closure_corrects_drift(self):
        """Square loop with yaw drift; loop factor snaps end to start."""
        true = rand_traj(12, seed=3)
        rs = np.random.RandomState(4)
        drift = jnp.asarray(np.cumsum(rs.randn(12, 6) * 0.01, 0).astype(np.float32))
        noisy = jnp.asarray(np.asarray(true) + np.asarray(drift))
        noisy = noisy.at[0].set(true[0])
        g = chain_graph(true, noisy)
        # loop factor: keyframe 11 relative to keyframe 0, strongly weighted
        meas = se3.pose6_between(true[0], true[11])
        g = g._replace(
            bt_i=g.bt_i.at[11].set(0), bt_j=g.bt_j.at[11].set(11),
            bt_meas=g.bt_meas.at[11].set(meas),
            bt_info=g.bt_info.at[11].set(jnp.full(6, 1e6)),
            bt_mask=g.bt_mask.at[11].set(True),
        )
        res = solver.solve(g, g.pose_mask, iterations=5)
        end_err = np.asarray(
            se3.pose6_between(res.graph.poses[11], true[11]))
        assert np.abs(end_err).max() < 5e-3

    def test_chi2_decreases(self):
        true = rand_traj(8)
        rs = np.random.RandomState(5)
        noisy = true + jnp.asarray(rs.randn(8, 6).astype(np.float32) * 0.1)
        g = chain_graph(true, noisy)
        r1 = solver.solve(g, g.pose_mask, iterations=1)
        r3 = solver.solve(g, g.pose_mask, iterations=3)
        assert float(r3.chi2) <= float(r1.chi2) + 1e-3

    def test_marginal_covariance_grows_along_chain(self):
        true = rand_traj(10)
        g = chain_graph(true, true)
        c1 = solver.marginal_covariance(g, jnp.int32(1))
        c9 = solver.marginal_covariance(g, jnp.int32(9))
        # translation variance accumulates with distance from the prior
        assert float(jnp.trace(c9[3:, 3:])) > float(jnp.trace(c1[3:, 3:]))
        # symmetric PSD
        np.testing.assert_allclose(c9, c9.T, atol=1e-6)


def test_window_mask():
    pm = jnp.zeros(16, bool).at[:10].set(True)
    m = solver.window_mask(pm, jnp.int32(10), 4)
    np.testing.assert_array_equal(np.asarray(m)[:10],
                                  [False] * 6 + [True] * 4)

