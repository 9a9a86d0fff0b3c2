"""Mission-level map sharding (round-4 verdict missing #1 / next #1).

The mission step itself — persistent incremental grid, keyframe cloud
store, registration, full corrections — runs over the virtual 8-device mesh
with the map SHARDED, and must (a) actually distribute the state, (b) track
a single-device full-capacity oracle, and (c) keep working at map sizes
that OVERFLOW one device's grid (the whole point: capacity scales with the
pod, like the reference's host-RAM-bounded keyframe history,
mapOptmization.cpp:1519-1588)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lio_slam_tpu.config import (Config, KeyframeConfig, RegistrationConfig,
                                 StaticConfig)
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.parallel import mesh as mesh_mod
from lio_slam_tpu.parallel import mission
from lio_slam_tpu.pipeline import lio
from lio_slam_tpu.utils import pointcloud as pc, se3


def _cfg(table_size):
    return Config(
        static=StaticConfig(max_raw_points=2048, max_scan_points=2048,
                            max_map_points=8192, max_keyframes=16,
                            max_keyframe_points=2048, max_loop_queue=2,
                            max_gps_queue=2, window_size=8,
                            max_imu_window=16),
        registration=RegistrationConfig(grid_table_size=table_size,
                                        grid_max_per_cell=8,
                                        degeneracy_eig_thresh=10.0),
        keyframe=KeyframeConfig(dist_threshold=0.2))


def _run_mission(cfg, seq, n, step, init_state):
    state = init_state()
    poses = []
    prev = None
    for i in range(n):
        if i == 0:
            guess = np.zeros(6, np.float32)
            gvalid = False
        else:
            inc = se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                    jnp.asarray(seq.poses[i]))
            guess = np.asarray(se3.pose6_compose(jnp.asarray(prev), inc))
            gvalid = True
        inp = lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[i]),
                           mask=jnp.asarray(seq.scan_masks[i])),
            stamp=jnp.float32(seq.stamps[i]), init_guess=jnp.asarray(guess),
            guess_valid=jnp.asarray(gvalid),
            imu_rpy=jnp.asarray(seq.poses[i, :3]),
            imu_available=jnp.asarray(True),
            gps_pos=jnp.zeros(3), gps_info=jnp.zeros(3),
            gps_valid=jnp.asarray(False))
        state, out = step(state, inp)
        prev = np.asarray(out.pose)
        poses.append(prev)
    return state, np.stack(poses)


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(n_scans=12, n_points=2048, seed=0,
                                   speed=2.0)


def test_sharded_mission_tracks_oracle_beyond_one_device_capacity(seq):
    """8-device sharded mission vs a single-device oracle with 8x the
    per-device table: identical capacity in total, so the poses must agree
    to registration-noise tolerance, while the PER-DEVICE table (what one
    chip would have) measurably overflows."""
    n = 12
    T_local = 512                    # per-device buckets (tiny on purpose)
    mesh = mesh_mod.make_mesh()      # 8 virtual CPU devices, axis "data"
    D = mesh.shape["data"]

    cfg_sh = _cfg(T_local)
    init_sh, step_sh, correct_sh, ops = mission.make_sharded_mission(
        mesh, cfg_sh)
    st_sh, poses_sh = _run_mission(cfg_sh, seq, n, step_sh, init_sh)

    # oracle: ONE device with the same TOTAL capacity
    cfg_or = _cfg(D * T_local)
    step_or = lio.make_lio_step(cfg_or)
    st_or, poses_or = _run_mission(cfg_or, seq, n, step_or,
                                   lambda: lio.init_state(cfg_or))

    # (a) the sharded state is actually distributed over the mesh
    shd = st_sh.map_grid.table.sharding
    assert not shd.is_fully_replicated, "grid table must be sharded"
    assert st_sh.map_grid.table.shape[0] == D * T_local
    cl_sh = st_sh.store.clouds.sharding
    assert not cl_sh.is_fully_replicated, "keyframe clouds must be sharded"

    # (b) oracle parity: same mission, same total capacity
    err = np.linalg.norm(poses_sh[:, 3:] - poses_or[:, 3:], axis=1)
    assert err.max() < 0.05, f"sharded mission diverged from oracle: {err}"

    # (c) the mission's map does not fit one device's grid: the total
    # inserted rows exceed one device's row capacity (T_local * C), i.e.
    # a single chip at the per-device size would be over capacity
    rows_used = int(np.asarray(st_sh.map_grid.counts).sum())
    one_device_rows = T_local * cfg_sh.registration.grid_max_per_cell
    assert rows_used > one_device_rows, (
        f"test must exceed one device's capacity: used {rows_used} rows vs "
        f"{one_device_rows} per-device capacity")

    # (d) registration quality holds at full sharded capacity: trajectory
    # tracks ground truth (est frame anchored at first pose)
    rel = np.stack([np.asarray(se3.pose6_between(
        jnp.asarray(seq.poses[0]), jnp.asarray(seq.poses[i])))
        for i in range(n)])
    ate = synthetic.ate_rmse(poses_sh, rel)
    assert ate < 0.05, f"sharded-mission ATE too high: {ate}"


def test_sharded_mission_full_correction_runs_sharded_solver(seq):
    """A loop constraint triggers the full correction: the sharded sparse
    solve + per-device map rebuild must leave a consistent state (finite
    poses, rebuilt shards still registering scans)."""
    n = 8
    mesh = mesh_mod.make_mesh()
    cfg = _cfg(512)
    init_sh, step_sh, correct_sh, ops = mission.make_sharded_mission(
        mesh, cfg)
    st, poses = _run_mission(cfg, seq, n, step_sh, init_sh)
    n_kf = int(st.store.count)
    assert n_kf >= 3
    meas = se3.pose6_between(st.store.poses[n_kf - 1], st.store.poses[0])
    st, added = lio.inject_loop_constraint(
        st, jnp.int32(n_kf - 1), jnp.int32(0), meas,
        jnp.full(6, 1e2, jnp.float32))
    assert bool(added)
    # consume at the next keyframe save (feed scans until one happens)
    prev = poses[-1]
    for i in range(n, n + 3):
        inc = se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                jnp.asarray(seq.poses[i]))
        guess = np.asarray(se3.pose6_compose(jnp.asarray(prev), inc))
        inp = lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[i]),
                           mask=jnp.asarray(seq.scan_masks[i])),
            stamp=jnp.float32(seq.stamps[i]),
            init_guess=jnp.asarray(guess), guess_valid=jnp.asarray(True),
            imu_rpy=jnp.asarray(seq.poses[i, :3]),
            imu_available=jnp.asarray(True), gps_pos=jnp.zeros(3),
            gps_info=jnp.zeros(3), gps_valid=jnp.asarray(False))
        st, out = step_sh(st, inp)
        prev = np.asarray(out.pose)
        if int(st.loop_count) >= 1:
            break
    assert int(st.loop_count) == 1
    st = correct_sh(st)
    assert not bool(st.needs_full_solve)
    assert np.isfinite(np.asarray(st.graph.poses)).all()
    # post-correction the rebuilt sharded map still registers a later scan
    j = min(i + 1, len(seq.stamps) - 1)
    inp2 = inp._replace(
        cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[j]),
                       mask=jnp.asarray(seq.scan_masks[j])),
        stamp=jnp.float32(seq.stamps[j]),
        init_guess=jnp.asarray(prev))
    st, out2 = step_sh(st, inp2)
    assert int(out2.num_inliers) > 200
    assert np.isfinite(np.asarray(out2.pose)).all()


def test_runner_sharded_mission_flag(seq):
    """`Runner(cfg, mesh=...)` runs the whole user-facing mission (prep,
    front-end, detector cadence, checkpointing surface) with the map
    sharded — the round-4 verdict's 'a Runner flag exposes it'."""
    from lio_slam_tpu.io import formats
    from lio_slam_tpu.pipeline.runner import Runner

    mesh = mesh_mod.make_mesh()
    cfg = _cfg(512)
    runner = Runner(cfg, loop_every=6, mesh=mesh, fetch_every=2)
    n = 10
    for i in range(n):
        m = seq.scan_masks[i]
        runner.process_scan(formats.StandardScan(
            xyz=seq.scans[i][m],
            intensity=np.zeros(int(m.sum()), np.float32),
            ring=np.zeros(int(m.sum()), np.uint16),
            time=np.zeros(int(m.sum()), np.float32),
            stamp=float(seq.stamps[i])))
    runner.drain()
    assert len(runner.trajectory) == n
    assert np.isfinite(np.stack(runner.trajectory)).all()
    assert not runner.state.map_grid.table.sharding.is_fully_replicated
    # trajectory quality holds through the runner surface too
    rel = np.stack([np.asarray(se3.pose6_between(
        jnp.asarray(seq.poses[0]), jnp.asarray(seq.poses[i])))
        for i in range(n)])
    ate = synthetic.ate_rmse(np.stack(runner.trajectory), rel)
    assert ate < 0.1, f"runner sharded-mission ATE too high: {ate}"
