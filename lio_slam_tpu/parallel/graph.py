"""Distributed pose-graph solve: factor-sharded assembly over the mesh.

The survey's north-star distributed-BA design (SURVEY.md §2.4/§5): factors
are sharded across the mesh 'data' axis, each device linearizes its factor
shard, and collectives reduce the normal equations.  Round-3's version
assembled a dense (K, K, 6, 6) Hessian per device, which cannot exist at the
production K=2048 (round-3 verdict missing #2); the implementation now lives
in `parallel/sparse.py` — per-keyframe block-tridiagonal assembly (O(K·36)
per device) with the Woodbury loop correction column-sharded — and this
module keeps the original (graph, active_mask, iterations) -> PoseGraph API.

Layout requirement (the mission layout guarantees it, pipeline/lio.py):
between slots [0, K-1) form the odometry chain (slot i couples i -> i+1);
slots >= K-1 are loop closures — same contract as `graph/sparse.py`.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.parallel.sparse import make_sharded_sparse_solver


def make_sharded_solver(mesh: Mesh, axis: str = "data"):
    """Returns solve(graph, active_mask, iterations) with linearization +
    block assembly sharded over `axis` (see parallel/sparse.py)."""
    inner = make_sharded_sparse_solver(mesh, axes=(axis,))

    @partial(jax.jit, static_argnames=("iterations",))
    def solve(graph: F.PoseGraph, active_mask: jax.Array,
              iterations: int = 2) -> F.PoseGraph:
        g = graph._replace(pose_mask=graph.pose_mask & active_mask)
        out = inner(g, iterations=iterations).graph
        return out._replace(pose_mask=graph.pose_mask)

    return solve
