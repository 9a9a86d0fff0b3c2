"""LOAM corner/surface feature extraction over a range image.

The reference's `featureExtraction.cpp` implements LOAM curvature features but
is broken in this fork: its ImageProjection never fills the ring/column index
arrays, so the node indexes empty vectors and the pipeline actually runs
surf-only on the full deskewed cloud (SURVEY.md §2.1 #4).  We implement the
extraction *correctly* (range-image based, fully vectorized) and keep it
optional — the default pipeline matches the reference's real behavior
(surf-only), but corner/surf registration is available for LOAM-style use.

Semantics mirrored from `featureExtraction.cpp`:
- curvature over +-5 in-ring neighbours (:81-101):
  c = (sum_{j!=0} (r_j - r_0))^2
- occlusion masking (:103-126): range jump > 0.3 m between column neighbours
  marks the farther side's 5 neighbours unusable
- parallel-beam masking (:128-139): both side diffs > 0.02 * range
- per-ring 6 sectors, <=20 edges each with curvature > edgeThreshold and
  non-max suppression over +-5 neighbours; surf = everything below
  surfThreshold (:141-237)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Features(NamedTuple):
    curvature: jax.Array   # (R, H)
    edge_mask: jax.Array   # (R, H) selected corner points
    surf_mask: jax.Array   # (R, H) surface candidates
    valid: jax.Array       # (R, H) usable points after masking


@partial(jax.jit, static_argnames=("num_sectors", "max_edges_per_sector"))
def extract_features(ranges: jax.Array, valid: jax.Array,
                     edge_threshold: float = 1.0,
                     surf_threshold: float = 0.1,
                     num_sectors: int = 6,
                     max_edges_per_sector: int = 20) -> Features:
    """ranges: (R, H) range image (0/garbage where ~valid)."""
    R, H = ranges.shape
    r = jnp.where(valid, ranges, 0.0)

    # curvature: sum over +-5 neighbours of (r_j - r_0)
    acc = -10.0 * r
    for j in list(range(-5, 0)) + list(range(1, 6)):
        acc = acc + jnp.roll(r, -j, axis=1)
    curv = acc * acc
    nb_ok = valid
    for j in list(range(-5, 0)) + list(range(1, 6)):
        nb_ok = nb_ok & jnp.roll(valid, -j, axis=1)

    # occlusion: big range jump between adjacent columns
    r_next = jnp.roll(r, -1, axis=1)
    jump = r_next - r
    occl_self = (jump < -0.3)     # next is much closer: this side occluded
    occl_next = (jump > 0.3)
    occluded = jnp.zeros_like(valid)
    for j in range(0, 6):
        occluded = occluded | jnp.roll(occl_self, j, axis=1)   # mark i..i-5? see note
    for j in range(1, 7):
        occluded = occluded | jnp.roll(occl_next, j, axis=1)
    # parallel beam: both neighbours differ by > 0.02 * range
    d_prev = jnp.abs(jnp.roll(r, 1, axis=1) - r)
    d_next = jnp.abs(r_next - r)
    parallel = (d_prev > 0.02 * r) & (d_next > 0.02 * r)

    usable = valid & nb_ok & ~occluded & ~parallel

    # per-ring sectors: pick top edges with spacing suppression
    sector_w = H // num_sectors
    curv_use = jnp.where(usable, curv, -1.0)

    def pick_sector(c_sec):
        """c_sec: (sector_w,) curvatures; greedy top-k with +-5 suppression."""
        k = min(max_edges_per_sector * 2, c_sec.shape[0])
        top_c, top_i = jax.lax.top_k(c_sec, k)

        def body(carry, ci):
            taken_mask, n_taken = carry
            c, i = ci
            # suppressed if within 5 columns of an already-taken index
            near = jnp.any(jnp.abs(taken_mask - i) <= 5)
            ok = (c > edge_threshold) & ~near & (n_taken < max_edges_per_sector)
            taken_mask = jnp.where(ok, taken_mask.at[n_taken % k].set(i), taken_mask)
            return (taken_mask, n_taken + ok.astype(jnp.int32)), ok

        init = (jnp.full(k, -1000, jnp.int32), jnp.zeros((), jnp.int32))
        (_, _), picked = jax.lax.scan(body, init, (top_c, top_i))
        mask = jnp.zeros(c_sec.shape[0], bool)
        mask = mask.at[jnp.where(picked, top_i, c_sec.shape[0] - 1)].max(picked)
        return mask

    sectors = curv_use[:, :sector_w * num_sectors].reshape(R * num_sectors, sector_w)
    edge_sec = jax.vmap(pick_sector)(sectors)
    edge_mask = jnp.zeros((R, H), bool)
    edge_mask = edge_mask.at[:, :sector_w * num_sectors].set(
        edge_sec.reshape(R, num_sectors * sector_w))

    surf_mask = usable & (curv < surf_threshold) & ~edge_mask
    return Features(curvature=curv, edge_mask=edge_mask & usable,
                    surf_mask=surf_mask, valid=usable)


@partial(jax.jit, static_argnames=("n_scan", "horizon"))
def project_range_image(xyz: jax.Array, mask: jax.Array, ring: jax.Array,
                        n_scan: int, horizon: int):
    """Build an organized (R, H) range image + index map from an unorganized
    scan with ring ids — the projectPointCloud step the reference leaves
    unfilled (imageProjection.cpp:577-615).

    Returns (ranges (R,H), valid (R,H), index (R,H) into the input arrays).
    """
    r = jnp.linalg.norm(xyz, axis=-1)
    theta = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    col = ((theta + jnp.pi) / (2 * jnp.pi) * horizon).astype(jnp.int32)
    col = jnp.clip(col, 0, horizon - 1)
    row = jnp.clip(ring.astype(jnp.int32), 0, n_scan - 1)
    flat = jnp.where(mask, row * horizon + col, n_scan * horizon)
    # keep the CLOSEST point per pixel (scatter-min on range)
    ranges = jnp.full(n_scan * horizon + 1, jnp.inf).at[flat].min(
        jnp.where(mask, r, jnp.inf))
    # index of the winning point: scatter-min on (range-encoded) key
    order = jnp.argsort(jnp.where(mask, r, jnp.inf), descending=True)
    idx_img = jnp.full(n_scan * horizon + 1, -1, jnp.int32).at[flat[order]].set(
        jnp.where(mask[order], order, -1).astype(jnp.int32))
    ranges = ranges[:-1].reshape(n_scan, horizon)
    idx_img = idx_img[:-1].reshape(n_scan, horizon)
    valid = jnp.isfinite(ranges)
    return jnp.where(valid, ranges, 0.0), valid, idx_img
