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
    """ranges: (R, H) range image (0/garbage where ~valid).

    Internally each ring is COMPACTED (valid pixels first, column order kept)
    before the neighbourhood ops — the reference iterates the compacted
    per-ring point vector, not raw columns (featureExtraction.cpp:81-101
    indexes cloudSmoothness over consecutive points), so isolated azimuth
    holes (quantization, dropouts) must not poison the ±5 windows.  Returned
    masks are scattered back to the original (R, H) layout."""
    R, H = ranges.shape
    # per-ring compaction permutation: valid first, original column order kept
    order = jnp.argsort(jnp.where(valid, 0, 1).astype(jnp.int32),
                        axis=1, stable=True)                   # (R, H)
    rows = jnp.arange(R)[:, None]
    rC = ranges[rows, order]
    vC = valid[rows, order]
    colC = order                                               # original column
    nv = jnp.sum(valid, axis=1)                                # (R,)
    pos = jnp.arange(H)[None, :]
    in_core = (pos >= 5) & (pos < nv[:, None] - 5) & vC

    r = jnp.where(vC, rC, 0.0)
    # curvature: sum over +-5 compacted neighbours of (r_j - r_0)  (:81-101)
    acc = -10.0 * r
    for j in list(range(-5, 0)) + list(range(1, 6)):
        acc = acc + jnp.roll(r, -j, axis=1)
    curv = acc * acc

    # occlusion (:103-126): neighbouring points within 10 original columns
    # with a range jump > 0.3 m mark the farther side's 5-6 points unusable
    r_next = jnp.roll(r, -1, axis=1)
    near_cols = jnp.abs(jnp.roll(colC, -1, axis=1) - colC) < 10
    jump = jnp.where(near_cols, r_next - r, 0.0)
    occl_self = (jump < -0.3)     # next is much closer: i-5..i occluded
    occl_next = (jump > 0.3)      # next is much farther: i+1..i+6 occluded
    occluded = jnp.zeros_like(vC)
    for j in range(0, 6):
        occluded = occluded | jnp.roll(occl_self, j, axis=1)
    for j in range(1, 7):
        occluded = occluded | jnp.roll(occl_next, j, axis=1)
    # parallel beam (:128-139): both neighbours differ by > 0.02 * range
    d_prev = jnp.abs(jnp.roll(r, 1, axis=1) - r)
    d_next = jnp.abs(r_next - r)
    parallel = (d_prev > 0.02 * r) & (d_next > 0.02 * r)

    usable = in_core & ~occluded & ~parallel

    # per-ring sectors over the COMPACTED index (the reference splits each
    # ring's point range into 6 equal index spans, :146-150): pick top edges
    # with +-5 spacing suppression
    sector_w = H // num_sectors
    curv_use = jnp.where(usable, curv, -1.0)

    def pick_sector(c_sec):
        """c_sec: (sector_w,) curvatures; greedy top-k with +-5 suppression."""
        k = min(max_edges_per_sector * 2, c_sec.shape[0])
        top_c, top_i = jax.lax.top_k(c_sec, k)

        def body(carry, ci):
            taken_mask, n_taken = carry
            c, i = ci
            # suppressed if within 5 points of an already-taken index
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
    edgeC = jnp.zeros((R, H), bool)
    edgeC = edgeC.at[:, :sector_w * num_sectors].set(
        edge_sec.reshape(R, num_sectors * sector_w))
    edgeC = edgeC & usable
    surfC = usable & (curv < surf_threshold) & ~edgeC

    # scatter compacted results back to original columns
    def back(mC, fill=False):
        out = jnp.full((R, H), fill, mC.dtype)
        return out.at[rows, colC].max(jnp.where(vC, mC, fill))

    curv_orig = jnp.zeros((R, H), curv.dtype).at[rows, colC].add(
        jnp.where(vC, curv, 0.0))
    return Features(curvature=curv_orig, edge_mask=back(edgeC),
                    surf_mask=back(surfC), valid=back(usable))


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
