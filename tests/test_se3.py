import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_slam_tpu.utils import se3


KEY = jax.random.PRNGKey(0)


def random_rotvecs(n, scale=2.0, key=KEY):
    w = jax.random.normal(key, (n, 3)) * scale
    # keep |w| < pi so log(exp(w)) round-trips on the principal branch
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    return w * (jnp.minimum(norm, 3.0) / jnp.maximum(norm, 1e-9))


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = random_rotvecs(64, scale=1.0)
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_exp_orthonormal(self):
        w = random_rotvecs(32, scale=3.0)
        R = se3.so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        R = se3.so3_exp(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
        assert jnp.all(jnp.isfinite(se3.so3_log(R)))

    def test_log_near_pi(self):
        axis = jnp.array([1.0, 0.0, 0.0])
        w = axis * (np.pi - 1e-4)
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        np.testing.assert_allclose(w, w2, atol=1e-3)

    def test_left_jacobian_numeric(self):
        w = jnp.array([0.3, -0.2, 0.5])
        J = se3.so3_left_jacobian(w)
        eps = 1e-3
        for i in range(3):
            dw = jnp.zeros(3).at[i].set(eps)
            Rp = se3.so3_exp(w + dw)
            R = se3.so3_exp(w)
            d = se3.so3_log(Rp @ R.T) / eps
            np.testing.assert_allclose(d, J[:, i], atol=2e-2)


class TestEuler:
    def test_rpy_roundtrip(self):
        rpy = jnp.array([[0.1, -0.2, 0.3], [1.0, 0.5, -2.0], [0.0, 0.0, 0.0]])
        R = se3.rpy_to_matrix(rpy)
        rpy2 = se3.matrix_to_rpy(R)
        np.testing.assert_allclose(rpy, rpy2, atol=1e-5)

    def test_matches_composition(self):
        # R = Rz Ry Rx
        rpy = jnp.array([0.2, -0.4, 1.1])
        Rx = se3.so3_exp(jnp.array([rpy[0], 0, 0]))
        Ry = se3.so3_exp(jnp.array([0, rpy[1], 0]))
        Rz = se3.so3_exp(jnp.array([0, 0, rpy[2]]))
        np.testing.assert_allclose(se3.rpy_to_matrix(rpy), Rz @ Ry @ Rx, atol=1e-5)


class TestQuat:
    def test_quat_matrix_roundtrip(self):
        w = random_rotvecs(32)
        R = se3.so3_exp(w)
        q = se3.matrix_to_quat(R)
        R2 = se3.quat_to_matrix(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_quat_mul_matches_matrix(self):
        k1, k2 = jax.random.split(KEY)
        Ra = se3.so3_exp(jax.random.normal(k1, (3,)))
        Rb = se3.so3_exp(jax.random.normal(k2, (3,)))
        qa, qb = se3.matrix_to_quat(Ra), se3.matrix_to_quat(Rb)
        np.testing.assert_allclose(
            se3.quat_to_matrix(se3.quat_mul(qa, qb)), Ra @ Rb, atol=1e-5)

    def test_slerp_endpoints(self):
        w = random_rotvecs(2)
        q0 = se3.matrix_to_quat(se3.so3_exp(w[0]))
        q1 = se3.matrix_to_quat(se3.so3_exp(w[1]))
        np.testing.assert_allclose(jnp.abs(jnp.sum(se3.slerp(q0, q1, 0.0) * q0)), 1.0, atol=1e-5)
        np.testing.assert_allclose(jnp.abs(jnp.sum(se3.slerp(q0, q1, 1.0) * q1)), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (16, 6))
        R, t = se3.se3_exp(xi)
        xi2 = se3.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=1e-4)

    def test_compose_inverse(self):
        xi = jax.random.normal(KEY, (8, 6))
        R, t = se3.se3_exp(xi)
        Ri, ti = se3.inverse(R, t)
        Rc, tc = se3.compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(tc, jnp.zeros_like(tc), atol=1e-5)

    def test_pose6_between(self):
        a = jnp.array([0.1, 0.2, -0.3, 1.0, 2.0, 3.0])
        b = jnp.array([-0.2, 0.1, 0.5, -1.0, 0.5, 2.0])
        ab = se3.pose6_between(a, b)
        b2 = se3.pose6_compose(a, ab)
        np.testing.assert_allclose(b, b2, atol=1e-4)

    def test_transform_points(self):
        pts = jax.random.normal(KEY, (100, 3))
        pose = jnp.array([0.3, -0.1, 0.8, 1.0, -2.0, 0.5])
        R, t = se3.pose6_to_Rt(pose)
        out = se3.transform_points(R, t, pts)
        np.testing.assert_allclose(out[0], R @ pts[0] + t, atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda w: se3.so3_log(se3.so3_exp(w))))
    w = random_rotvecs(128, scale=1.5)
    np.testing.assert_allclose(f(w), w, atol=1e-4)
