import jax.numpy as jnp
import numpy as np

from lio_slam_tpu.ops import knn as knn_mod
from lio_slam_tpu.ops import voxel_grid as vg


def test_grid_matches_bruteforce_within_radius():
    rs = np.random.RandomState(0)
    ref = rs.randn(2000, 3).astype(np.float32) * 5
    q = ref[rs.choice(2000, 300, replace=False)] + \
        rs.randn(300, 3).astype(np.float32) * 0.1
    refj, qj = jnp.asarray(ref), jnp.asarray(q)
    rm, qm = jnp.ones(2000, bool), jnp.ones(300, bool)

    grid = vg.build_grid(refj, rm, cell_size=1.0, table_size=4096,
                         max_per_cell=32)
    got = vg.query_knn(grid, qj, qm, k=5)
    ref_res = knn_mod.knn(qj, qm, refj, rm, k=5)

    # compare distances wherever the true 5th-NN is within the cell radius
    # (grid only guarantees neighbours within cell_size); brute computes d2
    # via the matmul expansion, the grid directly -> f32 tolerance 1e-4
    in_radius = np.asarray(ref_res.dist2[:, 4]) < 1.0
    gd = np.sort(np.asarray(got.dist2), axis=1)[in_radius]
    bd = np.sort(np.asarray(ref_res.dist2), axis=1)[in_radius]
    np.testing.assert_allclose(gd, bd, rtol=1e-3, atol=1e-4)
    assert in_radius.sum() > 20


def test_grid_ignores_masked_points():
    ref = jnp.concatenate([jnp.zeros((4, 3)), jnp.full((4, 3), 0.1)])
    rm = jnp.array([True] * 4 + [False] * 4)
    grid = vg.build_grid(ref, rm, 1.0, 512, 16)
    got = vg.query_knn(grid, jnp.zeros((1, 3)), jnp.ones(1, bool), k=5)
    assert int(got.valid.sum()) == 4


def test_grid_neighbor_coordinates_consistent():
    """Returned neighbour coordinates match the reported distances."""
    rs = np.random.RandomState(1)
    ref = jnp.asarray(rs.randn(500, 3).astype(np.float32))
    q = ref[:50] + 0.01
    grid = vg.build_grid(ref, jnp.ones(500, bool), 1.0, 1024, 32)
    got = vg.query_knn(grid, q, jnp.ones(50, bool), k=3)
    nb = np.asarray(got.neighbors)
    d2 = ((nb - np.asarray(q)[:, None, :]) ** 2).sum(-1)
    valid = np.asarray(got.valid)
    np.testing.assert_allclose(d2[valid], np.asarray(got.dist2)[valid],
                               rtol=1e-4, atol=1e-5)


def test_empty_grid_query():
    grid = vg.empty_grid(1.0, 512, 8)
    got = vg.query_knn(grid, jnp.zeros((4, 3)), jnp.ones(4, bool), k=5)
    assert not bool(got.valid.any())


def test_incremental_insert_matches_batch_build():
    rs = np.random.RandomState(2)
    a = rs.randn(300, 3).astype(np.float32) * 4
    b = rs.randn(300, 3).astype(np.float32) * 4 + 2.0
    q = jnp.asarray(a[:64])
    qm = jnp.ones(64, bool)

    # incremental: insert a then b
    grid = vg.empty_grid(1.0, 2048, 32)
    grid = vg.insert_points(grid, jnp.asarray(a), jnp.ones(300, bool))
    grid = vg.insert_points(grid, jnp.asarray(b), jnp.ones(300, bool))
    inc = vg.query_knn(grid, q, qm, k=5)

    # batch build over the union
    both = jnp.asarray(np.concatenate([a, b]))
    grid2 = vg.build_grid(both, jnp.ones(600, bool), 1.0, 2048, 32)
    bat = vg.query_knn(grid2, q, qm, k=5)

    np.testing.assert_allclose(np.sort(np.asarray(inc.dist2), 1),
                               np.sort(np.asarray(bat.dist2), 1),
                               rtol=1e-4, atol=1e-5)


def test_zhalo_matches_bruteforce_within_radius():
    """z-halo layout (9-cell query) is exact for in-radius neighbours, same
    guarantee as the 27-cell layout."""
    rs = np.random.RandomState(4)
    ref = rs.randn(2000, 3).astype(np.float32) * 5
    q = ref[rs.choice(2000, 300, replace=False)] + \
        rs.randn(300, 3).astype(np.float32) * 0.1
    refj, qj = jnp.asarray(ref), jnp.asarray(q)
    rm, qm = jnp.ones(2000, bool), jnp.ones(300, bool)

    grid = vg.build_grid(refj, rm, cell_size=1.0, table_size=4096,
                         max_per_cell=96, halo="z")
    got = vg.query_knn(grid, qj, qm, k=5, halo="z")
    ref_res = knn_mod.knn(qj, qm, refj, rm, k=5)

    in_radius = np.asarray(ref_res.dist2[:, 4]) < 1.0
    gd = np.sort(np.asarray(got.dist2), axis=1)[in_radius]
    bd = np.sort(np.asarray(ref_res.dist2), axis=1)[in_radius]
    np.testing.assert_allclose(gd, bd, rtol=1e-3, atol=1e-4)
    assert in_radius.sum() > 20


def test_zhalo_incremental_insert_matches_batch_build():
    rs = np.random.RandomState(5)
    a = rs.randn(300, 3).astype(np.float32) * 4
    b = rs.randn(300, 3).astype(np.float32) * 4 + 2.0
    q = jnp.asarray(a[:64])
    qm = jnp.ones(64, bool)

    grid = vg.empty_grid(1.0, 2048, 96)
    grid = vg.insert_points(grid, jnp.asarray(a), jnp.ones(300, bool),
                            halo="z")
    grid = vg.insert_points(grid, jnp.asarray(b), jnp.ones(300, bool),
                            halo="z")
    inc = vg.query_knn(grid, q, qm, k=5, halo="z")

    both = jnp.asarray(np.concatenate([a, b]))
    grid2 = vg.build_grid(both, jnp.ones(600, bool), 1.0, 2048, 96,
                          halo="z")
    bat = vg.query_knn(grid2, q, qm, k=5, halo="z")

    np.testing.assert_allclose(np.sort(np.asarray(inc.dist2), 1),
                               np.sort(np.asarray(bat.dist2), 1),
                               rtol=1e-4, atol=1e-5)


def test_zhalo_masked_points_ignored():
    ref = jnp.concatenate([jnp.zeros((4, 3)), jnp.full((4, 3), 0.1)])
    rm = jnp.array([True] * 4 + [False] * 4)
    grid = vg.build_grid(ref, rm, 1.0, 512, 16, halo="z")
    got = vg.query_knn(grid, jnp.zeros((1, 3)), jnp.ones(1, bool), k=5,
                       halo="z")
    assert int(got.valid.sum()) == 4


def test_insert_overflow_ring_overwrites():
    """More points than capacity in one cell: count saturates, grid stays
    valid and returns nearest among retained points."""
    rs = np.random.RandomState(3)
    pts = rs.rand(100, 3).astype(np.float32) * 0.5   # all in one cell
    grid = vg.empty_grid(1.0, 64, 8)
    grid = vg.insert_points(grid, jnp.asarray(pts), jnp.ones(100, bool))
    assert int(grid.counts.max()) <= 8
    got = vg.query_knn(grid, jnp.asarray(pts[:1]), jnp.ones(1, bool), k=5)
    assert int(got.valid.sum()) == 5
    assert np.isfinite(np.asarray(got.dist2)).all()


def test_fullhalo_matches_bruteforce_within_radius():
    """full-halo layout (single-bucket query) is exact for in-radius
    neighbours, same guarantee as the 27-cell layout."""
    rs = np.random.RandomState(6)
    ref = rs.randn(2000, 3).astype(np.float32) * 5
    q = ref[rs.choice(2000, 300, replace=False)] + \
        rs.randn(300, 3).astype(np.float32) * 0.1
    refj, qj = jnp.asarray(ref), jnp.asarray(q)
    rm, qm = jnp.ones(2000, bool), jnp.ones(300, bool)

    grid = vg.build_grid(refj, rm, cell_size=1.0, table_size=4096,
                         max_per_cell=160, halo="full")
    got = vg.query_knn(grid, qj, qm, k=5, halo="full")
    ref_res = knn_mod.knn(qj, qm, refj, rm, k=5)

    in_radius = np.asarray(ref_res.dist2[:, 4]) < 1.0
    gd = np.sort(np.asarray(got.dist2), axis=1)[in_radius]
    bd = np.sort(np.asarray(ref_res.dist2), axis=1)[in_radius]
    np.testing.assert_allclose(gd, bd, rtol=1e-3, atol=1e-4)
    assert in_radius.sum() > 20


def test_fullhalo_incremental_insert_matches_batch_build():
    rs = np.random.RandomState(7)
    a = rs.randn(300, 3).astype(np.float32) * 4
    b = rs.randn(300, 3).astype(np.float32) * 4 + 2.0
    q = jnp.asarray(a[:64])
    qm = jnp.ones(64, bool)

    grid = vg.empty_grid(1.0, 2048, 160)
    grid = vg.insert_points(grid, jnp.asarray(a), jnp.ones(300, bool),
                            halo="full")
    grid = vg.insert_points(grid, jnp.asarray(b), jnp.ones(300, bool),
                            halo="full")
    inc = vg.query_knn(grid, q, qm, k=5, halo="full")

    both = jnp.asarray(np.concatenate([a, b]))
    grid2 = vg.build_grid(both, jnp.ones(600, bool), 1.0, 2048, 160,
                          halo="full")
    bat = vg.query_knn(grid2, q, qm, k=5, halo="full")

    np.testing.assert_allclose(np.sort(np.asarray(inc.dist2), 1),
                               np.sort(np.asarray(bat.dist2), 1),
                               rtol=1e-4, atol=1e-5)


def test_fullhalo_masked_points_ignored():
    ref = jnp.concatenate([jnp.zeros((4, 3)), jnp.full((4, 3), 0.1)])
    rm = jnp.array([True] * 4 + [False] * 4)
    grid = vg.build_grid(ref, rm, 1.0, 512, 64, halo="full")
    got = vg.query_knn(grid, jnp.zeros((1, 3)), jnp.ones(1, bool), k=5,
                       halo="full")
    assert int(got.valid.sum()) == 4


def test_gather_candidates_planar_layout():
    """gather_candidates returns (3C, N) planar rows consistent with the
    table bucket each query hashes to."""
    rs = np.random.RandomState(8)
    ref = rs.randn(400, 3).astype(np.float32) * 3
    grid = vg.build_grid(jnp.asarray(ref), jnp.ones(400, bool), 1.0, 1024,
                         64, halo="full")
    q = jnp.asarray(ref[:32])
    cand = np.asarray(vg.gather_candidates(grid, q))
    C = 64
    assert cand.shape == (3 * C, 32)
    # cross-check against query_knn: the 1-NN of a query that coincides with
    # a map point must appear among its candidates at distance ~0
    cx, cy, cz = cand[:C], cand[C:2 * C], cand[2 * C:]
    qn = np.asarray(q)
    d2 = (cx - qn[:, 0]) ** 2 + (cy - qn[:, 1]) ** 2 + (cz - qn[:, 2]) ** 2
    assert np.all(d2.min(axis=0) < 1e-8)


def test_xyhalo_matches_bruteforce_within_radius():
    """xy-halo layout (3-cell z query over xy-9 inserted buckets) covers the
    same 27-cell neighbourhood — exact for in-radius neighbours."""
    rs = np.random.RandomState(5)
    ref = rs.randn(2000, 3).astype(np.float32) * 5
    q = ref[rs.choice(2000, 300, replace=False)] + \
        rs.randn(300, 3).astype(np.float32) * 0.1
    refj, qj = jnp.asarray(ref), jnp.asarray(q)
    rm, qm = jnp.ones(2000, bool), jnp.ones(300, bool)

    grid = vg.build_grid(refj, rm, cell_size=1.0, table_size=4096,
                         max_per_cell=160, halo="xy")
    got = vg.query_knn(grid, qj, qm, k=5, halo="xy")
    ref_res = knn_mod.knn(qj, qm, refj, rm, k=5)

    in_radius = np.asarray(ref_res.dist2[:, 4]) < 1.0
    gd = np.sort(np.asarray(got.dist2), axis=1)[in_radius]
    bd = np.sort(np.asarray(ref_res.dist2), axis=1)[in_radius]
    np.testing.assert_allclose(gd, bd, rtol=1e-3, atol=1e-4)
    assert in_radius.sum() > 20


def test_build_grid_chunked_matches_monolithic():
    """Chunked build (large-input path: fori_loop of small inserts instead
    of one multi-million-row sort whose TPU compile is pathological) must
    yield the same neighbours as the single-sort build."""
    import numpy as np
    from lio_slam_tpu.ops import voxel_grid as vg
    rs = np.random.RandomState(0)
    M = 6000
    pts = jnp.asarray(rs.uniform(-20, 20, (M, 3)).astype(np.float32))
    mask = jnp.asarray(rs.rand(M) > 0.1)
    q = jnp.asarray(rs.uniform(-18, 18, (256, 3)).astype(np.float32))
    qm = jnp.ones(256, bool)
    g1 = vg.build_grid(pts, mask, 1.0, 4096, 16, halo="z")
    g2 = vg.build_grid(pts, mask, 1.0, 4096, 16, halo="z", chunk=1024)
    r1 = vg.query_knn(g1, q, qm, k=5, halo="z")
    r2 = vg.query_knn(g2, q, qm, k=5, halo="z")
    np.testing.assert_allclose(np.sort(np.asarray(r1.dist2), axis=1),
                               np.sort(np.asarray(r2.dist2), axis=1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r1.valid).sum(),
                                  np.asarray(r2.valid).sum())
