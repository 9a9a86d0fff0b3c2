"""Unrolled small-matrix kernels vs jnp.linalg references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_slam_tpu.utils import smallmat


def _random_psd(key, n, batch=()):
    A = jax.random.normal(key, batch + (n, n))
    return A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(n)


@pytest.mark.parametrize("n", [3, 6])
def test_cholesky_solve_matches_linalg(n):
    key = jax.random.PRNGKey(0)
    A = _random_psd(key, n)
    b = jax.random.normal(jax.random.PRNGKey(1), (n,))
    x = smallmat.cholesky_solve(A, b)
    ref = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_cholesky_solve_batched():
    A = _random_psd(jax.random.PRNGKey(2), 6, batch=(7,))
    b = jax.random.normal(jax.random.PRNGKey(3), (7, 6))
    x = smallmat.cholesky_solve(A, b)
    ref = jnp.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_cholesky_solve_damping():
    # rank-deficient matrix: damping keeps the solve finite
    v = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
    A = jnp.outer(v, v)
    x = smallmat.cholesky_solve(A, v, eps=1e-6)
    assert np.all(np.isfinite(np.asarray(x)))


@pytest.mark.parametrize("n", [3, 6])
def test_eigh_jacobi_matches_linalg(n):
    A = _random_psd(jax.random.PRNGKey(4), n)
    w, V = smallmat.eigh_jacobi(A)
    w_ref, _ = jnp.linalg.eigh(A)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), rtol=1e-4,
                               atol=1e-5)
    # eigen property + orthonormality
    np.testing.assert_allclose(np.asarray(A @ V), np.asarray(V * w[None, :]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(V.T @ V), np.eye(n), atol=1e-4)


def test_eigh_jacobi_spread_spectrum():
    # eigenvalues spanning several orders (the degeneracy-gate regime:
    # eig threshold 100 vs well-observed directions ~1e4-1e6)
    V0, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(5), (6, 6)))
    w0 = jnp.array([1e-2, 5.0, 120.0, 3e3, 8e4, 1e6])
    A = (V0 * w0[None, :]) @ V0.T
    w, V = smallmat.eigh_jacobi(A)
    # atol floor: f32 eigenvalues are accurate to ~1e-7 * ||A||
    np.testing.assert_allclose(np.asarray(w), np.asarray(jnp.sort(w0)),
                               rtol=1e-3, atol=1e-6 * 1e6)


def test_degenerate_direction_detected():
    # a GN normal matrix with one unobserved direction must keep its
    # smallest eigenvalue under the threshold after the Jacobi solve
    J = jax.random.normal(jax.random.PRNGKey(6), (200, 6))
    J = J.at[:, 4].set(0.0)   # direction 4 unobserved
    A = J.T @ J * 100.0
    w, V = smallmat.eigh_jacobi(A)
    assert float(w[0]) < 1.0
    assert abs(float(V[4, 0])) > 0.99
