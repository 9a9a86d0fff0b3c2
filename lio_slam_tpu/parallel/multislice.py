"""Multi-slice (multi-host) scaling: a 2D ('slice', 'data') device mesh with
DCN-aware collective staging.

The reference is a single machine; its only scaling story is OpenMP cores
(SURVEY.md §2.4).  The TPU-native scale-out story (SURVEY.md §5
"long-context" analog) shards the two unbounded state axes over a pod:

- 'data' (ICI, intra-slice): scan/map points — the per-point hot loops.
- 'slice' (DCN, inter-slice): keyframes and factors — trajectory length.

Collectives are staged so the heavy reductions ride ICI and only the tiny
(K*6)^2-block partials cross DCN: `psum_staged` = psum over 'data' first,
then over 'slice'.  On one host this is exactly equivalent (XLA folds the
two psums); on a multi-slice deployment the first reduction happens on-chip
within each slice and the DCN sees one 6x6-block tensor per slice per GN
iteration — the same "assemble per shard, reduce globally" plan BASELINE.md
names as the distributed-BA north star.

No multi-slice hardware is attached in this environment; the layer is
validated on virtual-device meshes (tests/test_multislice.py) and shapes are
identical on real pods — only the mesh construction changes
(`jax.experimental.mesh_utils.create_hybrid_device_mesh` on real slices).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lio_slam_tpu.graph import factors as F
from lio_slam_tpu.graph import solver


def make_multislice_mesh(n_slices: int, chips_per_slice: int) -> Mesh:
    """2D mesh: axis 0 = 'slice' (crosses DCN on real pods), axis 1 = 'data'
    (ICI).  On real multi-slice deployments, construct with
    `mesh_utils.create_hybrid_device_mesh((n_slices,), (chips_per_slice,))`
    so the slice axis maps to slice boundaries; with a flat device list
    (single host / virtual devices) a reshape is the same topology."""
    devs = jax.devices()
    need = n_slices * chips_per_slice
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(n_slices, chips_per_slice)
    return Mesh(arr, ("slice", "data"))


def psum_staged(x, data_axis: str = "data", slice_axis: str = "slice"):
    """ICI-first reduction: reduce within each slice over ICI, then the
    per-slice partials over DCN."""
    return jax.lax.psum(jax.lax.psum(x, data_axis), slice_axis)


def shard_factors(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Factor arrays shard over BOTH axes flattened (K factors split across
    every device in the pod)."""
    spec = P(("slice", "data"), *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def make_multislice_solver(mesh: Mesh):
    """Pose-graph GN with factor linearization sharded over the whole pod
    and DCN-staged normal-equation reduction.

    Semantics match `graph.solver.solve` (same linearization + equilibrated
    Cholesky); only the assembly is distributed."""

    both = ("slice", "data")

    def _local_assembly(poses, bt_i, bt_j, bt_meas, bt_info, bt_mask,
                        gps_i, gps_meas, gps_info, gps_mask):
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

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(both), P(both), P(both), P(both), P(both),
                       P(both), P(both), P(both), P(both)),
             out_specs=(P(), P()),
             check_vma=False)
    def pod_linearize(*args):
        return psum_staged(_local_assembly(*args))

    @partial(jax.jit, static_argnames=("iterations",))
    def solve(graph: F.PoseGraph, active_mask: jax.Array,
              iterations: int = 2) -> F.PoseGraph:
        K = graph.poses.shape[0]
        dtype = graph.poses.dtype

        def step(_, g):
            H, b = pod_linearize(g.poses, g.bt_i, g.bt_j, g.bt_meas,
                                 g.bt_info, g.bt_mask, g.gps_i, g.gps_meas,
                                 g.gps_info, g.gps_mask)
            e0, J0 = F.linearize_prior(g)
            w0 = g.prior_info
            H = H.at[0, 0].add(jnp.einsum("ri,r,rj->ij", J0, w0, J0))
            b = b.at[0].add(-J0.T @ (w0 * e0))
            act = (active_mask & g.pose_mask).astype(dtype)
            H = H * act[:, None, None, None] * act[None, :, None, None]
            eye6 = jnp.eye(6, dtype=dtype)
            H = H + jnp.einsum("k,ij->kij", 1.0 - act, eye6)[:, None] * \
                jnp.eye(K, dtype=dtype)[:, :, None, None]
            H = H + (jnp.eye(K, dtype=dtype)[:, :, None, None] * eye6) * 1e-5
            b = b * act[:, None]
            Hf = H.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
            delta = solver._equilibrated_cholesky_solve(Hf, b.reshape(K * 6))
            return solver._retract_all(g, delta, active_mask)

        return jax.lax.fori_loop(0, iterations, step, graph)

    return solve


def make_multislice_register(mesh: Mesh, cfg, min_correspondences: int = 50):
    """Scan-to-map registration over the full pod: scan points sharded over
    BOTH mesh axes (pure data parallelism — per-point work has no cross-point
    coupling), 6x6 normal equations reduced ICI-first then DCN."""
    from lio_slam_tpu.ops import registration as reg
    from lio_slam_tpu.ops import voxel_grid as vg

    both = ("slice", "data")

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(both), P(both), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def normal_equations(scan, scan_mask, grid, pose):
        corr = reg.find_correspondences(scan, scan_mask, None, None,
                                        pose, cfg, grid=grid)
        AtA, Atb = reg._normal_equations(scan, corr, pose)
        n_inl = jnp.sum(corr.valid.astype(jnp.int32))
        return psum_staged((AtA, Atb, n_inl))

    @jax.jit
    def register(scan, scan_mask, map_pts, map_mask, init_pose):
        grid = vg.build_grid(map_pts, map_mask, cfg.nn_radius,
                             cfg.grid_table_size, cfg.grid_max_per_cell,
                             halo=cfg.grid_halo)

        def cond(st):
            _, _, _, it, conv = st
            return (it < cfg.max_iterations) & ~conv

        def body(st):
            pose, P_prev, degen_prev, it, _ = st
            AtA, Atb, n_inl = normal_equations(scan, scan_mask, grid, pose)
            dx = jnp.linalg.solve(AtA + jnp.eye(6, dtype=AtA.dtype) * 1e-6, Atb)
            Pm, degen = reg._degeneracy_projection(AtA, cfg.degeneracy_eig_thresh)
            Pm = jnp.where(it == 0, Pm, P_prev)
            degen = jnp.where(it == 0, degen, degen_prev)
            dx = jnp.where(degen, Pm @ dx, dx)
            enough = n_inl >= min_correspondences
            dx = jnp.where(enough, dx, jnp.zeros_like(dx))
            pose = pose + dx
            dr = jnp.linalg.norm(dx[:3]) * (180.0 / jnp.pi)
            dt = jnp.linalg.norm(dx[3:]) * 100.0
            conv = ((dr < cfg.rot_converge) & (dt < cfg.trans_converge)) | ~enough
            return (pose, Pm, degen, it + 1, conv)

        init = (init_pose.astype(jnp.float32), jnp.eye(6, dtype=jnp.float32),
                jnp.zeros((), bool), jnp.zeros((), jnp.int32),
                jnp.zeros((), bool))
        pose, _, degen, it, conv = jax.lax.while_loop(cond, body, init)
        return reg.RegistrationResult(pose=pose, degenerate=degen,
                                      converged=conv, iterations=it,
                                      num_inliers=jnp.zeros((), jnp.int32),
                                      mean_residual=jnp.zeros(()))

    return register
