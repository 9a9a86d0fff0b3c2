"""2.5D elevation / occupancy rasterization.

Replaces the reference's grid_map_pcl pipeline
(`src/grid_map/grid_map_pcl/src/grid_map_pcl_loader_node.cpp:45-72` +
`GridMapPclLoader`): the downstream consumer subscribes the local planning
cloud and publishes a `/height_map` GridMap.  The whole 26.5 kLoC library's
used capability is "rasterize a cloud into an elevation grid" — on TPU that
is one scatter-max (elevation), scatter-add (counts/occupancy) and an
optional scatter-min, over a fixed-size grid centered on the vehicle.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class HeightMap(NamedTuple):
    elevation: jax.Array   # (H, W) max z per cell (NaN where empty)
    min_z: jax.Array       # (H, W) min z per cell
    count: jax.Array       # (H, W) points per cell
    origin: jax.Array      # (2,) world xy of cell (0, 0) corner
    resolution: jax.Array  # () meters per cell


@partial(jax.jit, static_argnames=("shape",))
def rasterize(xyz: jax.Array, mask: jax.Array, center_xy: jax.Array,
              resolution: float = 0.2, shape: tuple = (512, 512)) -> HeightMap:
    """Scatter a masked cloud into an elevation grid centred on `center_xy`."""
    H, W = shape
    res = jnp.float32(resolution)
    origin = center_xy - jnp.array([H, W], jnp.float32) * res / 2.0
    ij = jnp.floor((xyz[:, :2] - origin[None, :]) / res).astype(jnp.int32)
    inb = mask & (ij[:, 0] >= 0) & (ij[:, 0] < H) & (ij[:, 1] >= 0) & (ij[:, 1] < W)
    flat = jnp.where(inb, ij[:, 0] * W + ij[:, 1], H * W)
    z = xyz[:, 2]
    elev = jnp.full(H * W + 1, -jnp.inf).at[flat].max(jnp.where(inb, z, -jnp.inf))
    mins = jnp.full(H * W + 1, jnp.inf).at[flat].min(jnp.where(inb, z, jnp.inf))
    cnt = jnp.zeros(H * W + 1, jnp.int32).at[flat].add(inb.astype(jnp.int32))
    elev = elev[:-1].reshape(H, W)
    mins = mins[:-1].reshape(H, W)
    cnt = cnt[:-1].reshape(H, W)
    empty = cnt == 0
    return HeightMap(
        elevation=jnp.where(empty, jnp.nan, elev),
        min_z=jnp.where(empty, jnp.nan, mins),
        count=cnt, origin=origin, resolution=res)


@jax.jit
def inpaint_nearest(hm: HeightMap, iterations: int = 4) -> jax.Array:
    """Fill empty cells from neighbour means (grid_map_cv inpainting, coarse
    equivalent) — a few Jacobi passes, jit-friendly."""
    e = jnp.where(jnp.isnan(hm.elevation), 0.0, hm.elevation)
    known = (~jnp.isnan(hm.elevation)).astype(jnp.float32)

    def body(_, carry):
        e, known = carry
        ksum = (jnp.roll(known, 1, 0) + jnp.roll(known, -1, 0)
                + jnp.roll(known, 1, 1) + jnp.roll(known, -1, 1))
        esum = (jnp.roll(e * known, 1, 0) + jnp.roll(e * known, -1, 0)
                + jnp.roll(e * known, 1, 1) + jnp.roll(e * known, -1, 1))
        fill = jnp.where((known == 0) & (ksum > 0), esum / jnp.maximum(ksum, 1), e)
        new_known = jnp.where((known == 0) & (ksum > 0), 1.0, known)
        return fill, new_known

    e, known = jax.lax.fori_loop(0, iterations, body, (e, known))
    return jnp.where(known > 0, e, jnp.nan)
