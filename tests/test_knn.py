import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.ops import knn


def brute_np(q, r, k):
    d2 = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)


def test_knn_matches_numpy():
    rs = np.random.RandomState(0)
    q = rs.randn(64, 3).astype(np.float32)
    r = rs.randn(500, 3).astype(np.float32)
    out = knn.knn(jnp.asarray(q), jnp.ones(64, bool),
                  jnp.asarray(r), jnp.ones(500, bool), k=5, chunk=128)
    idx_np, d2_np = brute_np(q, r, 5)
    np.testing.assert_allclose(np.sort(np.asarray(out.dist2), axis=1),
                               np.sort(d2_np, axis=1), rtol=1e-3, atol=1e-4)
    # sets of neighbours agree (order may differ on ties)
    same = [set(a) == set(b) for a, b in zip(np.asarray(out.idx), idx_np)]
    assert np.mean(same) > 0.95


def test_knn_respects_ref_mask():
    q = jnp.zeros((4, 3))
    r = jnp.concatenate([jnp.zeros((3, 3)), jnp.full((5, 3), 100.0)])
    rmask = jnp.array([False, False, False, True, True, True, True, True])
    out = knn.knn(q, jnp.ones(4, bool), r, rmask, k=2, chunk=4)
    # nearest valid points are the far ones
    assert np.all(np.asarray(out.idx) >= 3)
    np.testing.assert_allclose(np.asarray(out.dist2), 3 * 100.0 ** 2, rtol=1e-4)


def test_knn_invalid_query():
    q = jnp.zeros((2, 3))
    r = jnp.zeros((8, 3))
    out = knn.knn(q, jnp.array([True, False]), r, jnp.ones(8, bool), k=3, chunk=8)
    assert bool(out.valid[0].all())
    assert not bool(out.valid[1].any())


def test_knn_fewer_valid_refs_than_k():
    q = jnp.zeros((2, 3))
    r = jnp.ones((8, 3))
    rmask = jnp.zeros(8, bool).at[0].set(True)
    out = knn.knn(q, jnp.ones(2, bool), r, rmask, k=3, chunk=8)
    assert int(out.valid[0].sum()) == 1


def test_knn_nonmultiple_chunk():
    rs = np.random.RandomState(1)
    r = rs.randn(100, 3).astype(np.float32)   # 100 not divisible by 64
    q = r[:10]
    out = knn.knn(jnp.asarray(q), jnp.ones(10, bool),
                  jnp.asarray(r), jnp.ones(100, bool), k=1, chunk=64)
    np.testing.assert_array_equal(np.asarray(out.idx[:, 0]), np.arange(10))
    np.testing.assert_allclose(np.asarray(out.dist2[:, 0]), 0.0, atol=1e-5)


def test_radius_neighbors_mask():
    ref = jnp.array([[0, 0, 0], [3, 0, 0], [10, 0, 0]], jnp.float32)
    m = knn.radius_neighbors_mask(jnp.zeros(3), ref, jnp.ones(3, bool), 5.0)
    np.testing.assert_array_equal(np.asarray(m), [True, True, False])
