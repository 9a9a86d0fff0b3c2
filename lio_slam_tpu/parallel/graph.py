"""Distributed pose-graph solve: factor-sharded normal-equation assembly.

The survey's north-star distributed-BA design (SURVEY.md §2.4/§5): factors
are sharded across the mesh 'data' axis, each device linearizes its factor
shard and assembles a partial dense normal-equation system, and a `psum`
over ICI reduces the blocks; the (small) solve is replicated.  This is the
TPU-native replacement for "a bigger iSAM2" — graph capacity scales with the
number of devices holding factor shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.graph import solver


def make_sharded_solver(mesh: Mesh, axis: str = "data"):
    """Returns solve(graph, active_mask, iterations) with between/GPS factor
    linearization + assembly sharded over the mesh."""

    def _local_assembly(poses, bt_i, bt_j, bt_meas, bt_info, bt_mask,
                        gps_i, gps_meas, gps_info, gps_mask, active):
        """Runs per device on its factor shard; returns partial (H, b)."""
        K = poses.shape[0]
        dtype = poses.dtype
        H = jnp.zeros((K, K, 6, 6), dtype)
        b = jnp.zeros((K, 6), dtype)

        def one(pi, pj, meas):
            e = F.between_error(pi, pj, F.Z6(), F.Z6(), meas)
            Ji = F._between_jac_i(pi, pj, F.Z6(), F.Z6(), meas)
            Jj = F._between_jac_j(pi, pj, F.Z6(), F.Z6(), meas)
            return e, Ji, Jj

        eb, Ji, Jj = jax.vmap(one)(poses[bt_i], poses[bt_j], bt_meas)
        wb = bt_info * bt_mask[:, None]
        H = H.at[bt_i, bt_i].add(jnp.einsum("bri,br,brj->bij", Ji, wb, Ji))
        H = H.at[bt_j, bt_j].add(jnp.einsum("bri,br,brj->bij", Jj, wb, Jj))
        Hij = jnp.einsum("bri,br,brj->bij", Ji, wb, Jj)
        H = H.at[bt_i, bt_j].add(Hij)
        H = H.at[bt_j, bt_i].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[bt_i].add(-jnp.einsum("bri,br,br->bi", Ji, wb, eb))
        b = b.at[bt_j].add(-jnp.einsum("bri,br,br->bi", Jj, wb, eb))

        def one_gps(pi, meas):
            e = F.gps_error(pi, F.Z6(), meas)
            J = F._gps_jac(pi, F.Z6(), meas)
            return e, J

        eg, Jg = jax.vmap(one_gps)(poses[gps_i], gps_meas)
        wg = gps_info * gps_mask[:, None]
        H = H.at[gps_i, gps_i].add(jnp.einsum("gri,gr,grj->gij", Jg, wg, Jg))
        b = b.at[gps_i].add(-jnp.einsum("gri,gr,gr->gi", Jg, wg, eg))
        return H, b

    def sharded_linearize(graph: F.PoseGraph, active_mask: jax.Array):
        K = graph.poses.shape[0]
        dtype = graph.poses.dtype

        local = partial(jax.shard_map, mesh=mesh,
                        in_specs=(P(), P(axis), P(axis), P(axis), P(axis),
                                  P(axis), P(axis), P(axis), P(axis), P(axis),
                                  P()),
                        out_specs=(P(), P()),
                        check_vma=False)(
            lambda *args: jax.lax.psum(_local_assembly(*args), axis))

        H, b = local(graph.poses, graph.bt_i, graph.bt_j, graph.bt_meas,
                     graph.bt_info, graph.bt_mask, graph.gps_i,
                     graph.gps_meas, graph.gps_info, graph.gps_mask,
                     active_mask)

        # prior (single factor — replicated)
        e0, J0 = F.linearize_prior(graph)
        w0 = graph.prior_info
        H = H.at[0, 0].add(jnp.einsum("ri,r,rj->ij", J0, w0, J0))
        b = b.at[0].add(-J0.T @ (w0 * e0))

        act = (active_mask & graph.pose_mask).astype(dtype)
        H = H * act[:, None, None, None] * act[None, :, None, None]
        eye6 = jnp.eye(6, dtype=dtype)
        H = H + jnp.einsum("k,ij->kij", 1.0 - act, eye6)[:, None] * \
            jnp.eye(K, dtype=dtype)[:, :, None, None]
        H = H + (jnp.eye(K, dtype=dtype)[:, :, None, None] * eye6) * 1e-5
        b = b * act[:, None]
        return H.transpose(0, 2, 1, 3).reshape(K * 6, K * 6), b.reshape(K * 6)

    @partial(jax.jit, static_argnames=("iterations",))
    def solve(graph: F.PoseGraph, active_mask: jax.Array,
              iterations: int = 2) -> F.PoseGraph:
        def step(_, g):
            H, b = sharded_linearize(g, active_mask)
            delta = solver._equilibrated_cholesky_solve(H, b)
            return solver._retract_all(g, delta, active_mask)

        return jax.lax.fori_loop(0, iterations, step, graph)

    return solve
