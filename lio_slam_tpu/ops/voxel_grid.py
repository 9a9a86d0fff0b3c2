"""Spatial hash-grid neighbour search — the production k-NN path.

The reference rebuilds a PCL kd-tree over the local map every scan
(`mapOptmization.cpp:1846`) and queries 5-NN per point per GN iteration
(:1631).  Kd-trees are pointer-chasing; the TPU-native equivalent is a voxel
bucket grid in **bucket-major layout**:

  points live in a (T buckets x C slots x 3) table, so a query gathers 27
  whole buckets as wide contiguous rows (192 B each) instead of 432 scattered
  12 B rows — ~4x faster on TPU, whose gathers are descriptor-bound.

  build (amortizable — the map is static across GN iterations and, with the
  incremental map, across scans):
    hash cell -> sort by bucket -> scatter into the bucket table.
  query (per GN iteration):
    gather 27 buckets -> exact distances -> top-k.  O(N * 27 * C) with all
    compute in registers/VMEM-friendly shapes.

Hash collisions merely add far-away candidates (distance-filtered), never
wrong neighbours.  Bucket overflow drops points beyond `max_per_cell` — sized
so a 0.4 m-voxel-downsampled map rarely overflows a 1 m cell (<= ~16 pts).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e30)


class HashGrid(NamedTuple):
    """Bucket-major point table.  T, C are static (from shape)."""

    table: jax.Array         # (T, C, 3) float32 points
    counts: jax.Array        # (T,) int32 valid slots per bucket
    cell_size: jax.Array     # () float32


class NeighborResult(NamedTuple):
    """k nearest neighbours with coordinates materialized (no secondary
    gather needed by the consumer)."""

    neighbors: jax.Array     # (N, k, 3) coordinates (garbage where ~valid)
    dist2: jax.Array         # (N, k)
    valid: jax.Array         # (N, k)


def _cell_hash(coords: jax.Array, table_size: int) -> jax.Array:
    h = (coords[..., 0] * 73856093) ^ (coords[..., 1] * 19349663) \
        ^ (coords[..., 2] * 83492791)
    return jnp.abs(h) % table_size


@partial(jax.jit, static_argnames=("table_size", "max_per_cell"))
def build_grid(points: jax.Array, mask: jax.Array, cell_size: float,
               table_size: int = 32768, max_per_cell: int = 16) -> HashGrid:
    cs = jnp.float32(cell_size)
    coords = jnp.floor(points / cs).astype(jnp.int32)
    h = _cell_hash(coords, table_size)
    h = jnp.where(mask, h, table_size)            # invalid points sort last
    order = jnp.argsort(h)
    h_s = h[order]
    pts_s = points[order]
    mask_s = mask[order]
    # within-bucket rank = position - first position of this bucket value
    first = jnp.concatenate([jnp.array([True]), h_s[1:] != h_s[:-1]])
    pos = jnp.arange(h_s.shape[0], dtype=jnp.int32)
    run_start = jnp.where(first, pos, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    rank = pos - run_start
    keep = mask_s & (rank < max_per_cell)
    dst_b = jnp.where(keep, h_s, table_size)      # park dropped rows
    dst_s = jnp.where(keep, rank, 0)
    table = jnp.zeros((table_size + 1, max_per_cell, 3), points.dtype)
    table = table.at[dst_b, dst_s].set(pts_s)
    counts = jnp.zeros(table_size + 1, jnp.int32).at[dst_b].add(keep.astype(jnp.int32))
    return HashGrid(table=table[:table_size], counts=counts[:table_size],
                    cell_size=cs)


_OFFSETS = jnp.stack(jnp.meshgrid(
    jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
    indexing="ij"), axis=-1).reshape(27, 3)


@partial(jax.jit, static_argnames=("k",))
def query_knn(grid: HashGrid, queries: jax.Array, query_mask: jax.Array,
              k: int = 5) -> NeighborResult:
    """Exact k-NN among the candidates in the 27 cells around each query.

    Correct for any neighbour within `cell_size` of the query (the radius the
    registration gate uses) as long as bucket occupancy <= C.

    Layout: offset-major — every intermediate keeps the N queries as the LAST
    (lane) dimension, so the (27, C)-sized small dims never waste VPU tiles
    (the query-major (N, 27, C, 3) formulation is ~35% slower on TPU).
    """
    T, C, _ = grid.table.shape
    N = queries.shape[0]
    qT = queries.T                                                   # (3, N)
    coords = jnp.floor(qT / grid.cell_size).astype(jnp.int32)        # (3, N)
    offs = _OFFSETS.T.astype(jnp.int32)                              # (3, 27)
    cells = coords[:, None, :] + offs[:, :, None]                    # (3, 27, N)
    h = (cells[0] * 73856093) ^ (cells[1] * 19349663) ^ (cells[2] * 83492791)
    hh = jnp.abs(h) % T                                              # (27, N)
    # distinct offset cells may hash-collide to the same bucket; scanning it
    # twice would duplicate candidates and crowd out true neighbours
    dup = jnp.any((hh[:, None, :] == hh[None, :, :])
                  & (jnp.arange(27)[:, None, None] > jnp.arange(27)[None, :, None]),
                  axis=1)                                            # (27, N)
    flat = grid.table.reshape(T, C * 3)
    cand = flat[hh]                                                  # (27, N, 3C) wide gather
    candT = jnp.swapaxes(cand, 1, 2).reshape(27, C, 3, N)
    cnt = grid.counts[hh]                                            # (27, N)
    slot_ok = (jnp.arange(C)[None, :, None] < cnt[:, None, :]) & ~dup[:, None, :]
    cx = candT[:, :, 0, :].reshape(27 * C, N)
    cy = candT[:, :, 1, :].reshape(27 * C, N)
    cz = candT[:, :, 2, :].reshape(27 * C, N)
    d2 = ((cx - qT[0][None, :]) ** 2 + (cy - qT[1][None, :]) ** 2
          + (cz - qT[2][None, :]) ** 2)
    d2 = jnp.where(slot_ok.reshape(27 * C, N), d2, _BIG)
    # k iterative masked mins along the (small) candidate axis — each is a
    # lane-parallel reduction; cheaper than a sort-based top_k here
    nbs, dsts = [], []
    dd = d2
    for _ in range(k):
        am = jnp.argmin(dd, axis=0)                                  # (N,)
        dmin = jnp.min(dd, axis=0)
        nx = jnp.take_along_axis(cx, am[None, :], axis=0)[0]
        ny = jnp.take_along_axis(cy, am[None, :], axis=0)[0]
        nz = jnp.take_along_axis(cz, am[None, :], axis=0)[0]
        nbs.append(jnp.stack([nx, ny, nz], axis=-1))
        dsts.append(dmin)
        dd = dd.at[am, jnp.arange(N)].set(_BIG)
    neighbors = jnp.stack(nbs, axis=1)                               # (N, k, 3)
    best_d = jnp.stack(dsts, axis=1)                                 # (N, k)
    valid = (best_d < _BIG) & query_mask[:, None]
    return NeighborResult(neighbors=neighbors,
                          dist2=jnp.where(valid, jnp.maximum(best_d, 0.0), _BIG),
                          valid=valid)


@partial(jax.jit, static_argnames=())
def insert_points(grid: HashGrid, points: jax.Array, mask: jax.Array) -> HashGrid:
    """Incrementally insert points into an existing grid (the rolling local
    map: new keyframe clouds are scattered in; no per-scan rebuild).  Slots
    fill per-bucket; overflowing points overwrite the bucket ring-buffer style
    (oldest-first), which bounds memory like the reference's rolling 50 m
    local map window."""
    T, C, _ = grid.table.shape
    coords = jnp.floor(points / grid.cell_size).astype(jnp.int32)
    h = _cell_hash(coords, T)
    h = jnp.where(mask, h, T)
    # rank of each point within its bucket among THIS batch
    order = jnp.argsort(h)
    h_s = h[order]
    pts_s = points[order]
    mask_s = mask[order]
    first = jnp.concatenate([jnp.array([True]), h_s[1:] != h_s[:-1]])
    pos = jnp.arange(h_s.shape[0], dtype=jnp.int32)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, pos, 0))
    rank = pos - run_start
    base = jnp.where(h_s < T, grid.counts[jnp.minimum(h_s, T - 1)], 0)
    slot = (base + rank) % C                       # ring overwrite on overflow
    keep = mask_s & (rank < C)                     # at most C new per bucket
    dst_b = jnp.where(keep, h_s, T)
    padded_table = jnp.concatenate(
        [grid.table, jnp.zeros((1, C, 3), grid.table.dtype)], axis=0)
    padded_table = padded_table.at[dst_b, jnp.where(keep, slot, 0)].set(pts_s)
    new_in_bucket = jnp.zeros(T + 1, jnp.int32).at[dst_b].add(keep.astype(jnp.int32))
    counts = jnp.minimum(grid.counts + new_in_bucket[:T], C)
    return HashGrid(table=padded_table[:T], counts=counts,
                    cell_size=grid.cell_size)


def empty_grid(cell_size: float, table_size: int = 32768,
               max_per_cell: int = 16, dtype=jnp.float32) -> HashGrid:
    return HashGrid(
        table=jnp.zeros((table_size, max_per_cell, 3), dtype),
        counts=jnp.zeros(table_size, jnp.int32),
        cell_size=jnp.float32(cell_size))
