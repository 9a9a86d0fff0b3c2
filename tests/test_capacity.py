"""Keyframe-capacity policy: eviction with graph rebase instead of silent
corruption (round-2 verdict confirmed bug: unclamped `new_idx == K` dropped
the pose write and scattered an odometry-strength phantom factor into loop
slot K-1).

The reference never faces this — iSAM2 just appends forever
(mapOptmization.cpp:2097-2134) — so a bounded store must either evict
gracefully or fail loudly; we evict (ring buffer + prior rebase) and surface
the count through StepOutput.evictions / Runner.health().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_slam_tpu.config import (Config, GpsConfig, KeyframeConfig,
                                 RegistrationConfig, StaticConfig)
from lio_slam_tpu.graph import solver
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.pipeline import lio
from lio_slam_tpu.utils import pointcloud as pc
from lio_slam_tpu.utils import se3


def tiny_config(max_keyframes: int) -> Config:
    return Config(
        static=StaticConfig(
            max_raw_points=2048, max_scan_points=2048, max_map_points=8192,
            max_keyframes=max_keyframes, max_keyframe_points=1024,
            max_loop_queue=2, max_gps_queue=1, window_size=4),
        registration=RegistrationConfig(max_iterations=6,
                                        degeneracy_eig_thresh=10.0),
        # every scan becomes a keyframe (0.2 m/scan at speed 2.0, dt 0.1)
        keyframe=KeyframeConfig(dist_threshold=0.05),
    )


def run_mission(cfg, n_scans: int):
    """Feed n_scans through the jitted step with truth-increment guesses."""
    seq = synthetic.make_sequence(n_scans=n_scans, n_points=2048, seed=0,
                                  speed=2.0)
    step = lio.make_lio_step(cfg)
    state = lio.init_state(cfg)
    outs = []
    for i in range(n_scans):
        if i == 0:
            guess, gvalid = np.zeros(6, np.float32), False
        else:
            inc = se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                    jnp.asarray(seq.poses[i]))
            guess = np.asarray(se3.pose6_compose(
                jnp.asarray(np.asarray(outs[-1].pose)), inc))
            gvalid = True
        inp = lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[i]),
                           mask=jnp.asarray(seq.scan_masks[i])),
            stamp=jnp.float32(seq.stamps[i]),
            init_guess=jnp.asarray(guess), guess_valid=jnp.asarray(gvalid),
            imu_rpy=jnp.asarray(seq.imu_rpy[i]),
            imu_available=jnp.asarray(True),
            gps_pos=jnp.zeros(3), gps_info=jnp.zeros(3),
            gps_valid=jnp.asarray(False))
        state, out = step(state, inp)
        outs.append(out)
    return seq, state, outs


def assert_graph_consistent(state, cfg):
    """The invariants the round-2 bug violated."""
    K = cfg.static.max_keyframes
    count = int(state.store.count)
    assert count <= K
    bt_i = np.asarray(state.graph.bt_i)
    bt_j = np.asarray(state.graph.bt_j)
    bt_mask = np.asarray(state.graph.bt_mask)
    # odometry chain intact: slot i holds exactly factor i -> i+1
    for i in range(count - 1):
        assert bt_mask[i], f"chain slot {i} lost"
        assert bt_i[i] == i and bt_j[i] == i + 1, \
            f"chain slot {i} holds ({bt_i[i]},{bt_j[i]})"
    # no factor escapes the active pose range
    active = bt_mask.nonzero()[0]
    assert (bt_j[active] < count).all() and (bt_i[active] < count).all()
    # loop region carries ONLY accepted loops (the phantom factor of the
    # round-2 repro landed here with loop_count == 0)
    n_loops_stored = int(bt_mask[K - 1:].sum())
    assert n_loops_stored <= int(state.loop_count)
    assert np.isfinite(np.asarray(state.store.poses)).all()
    assert np.isfinite(np.asarray(state.graph.poses)).all()


def test_saturation_repro_capacity4():
    """The verdict's exact repro: capacity 4, 8 keyframes."""
    cfg = tiny_config(max_keyframes=4)
    seq, state, outs = run_mission(cfg, n_scans=8)
    assert int(state.store.count) == 4
    assert int(state.evict_count) == 4
    assert int(outs[-1].evictions) == 4
    assert int(state.loop_count) == 0
    assert_graph_consistent(state, cfg)
    # the store holds the LAST 4 keyframes: stamps strictly increasing and
    # matching the tail of the mission
    stamps = np.asarray(state.store.stamps)[:4]
    assert (np.diff(stamps) > 0).all()
    np.testing.assert_allclose(stamps, seq.stamps[4:8], atol=1e-5)


def test_long_mission_3x_capacity_tracks():
    """3x capacity: trajectory keeps tracking, graph solvable, drift bounded."""
    cfg = tiny_config(max_keyframes=6)
    seq, state, outs = run_mission(cfg, n_scans=19)
    assert int(state.evict_count) >= 2 * 6
    assert_graph_consistent(state, cfg)
    # ATE over the whole mission output (est frame anchored at first pose)
    est = np.stack([np.asarray(o.pose) for o in outs])
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                                 jnp.asarray(p)))
                    for p in seq.poses])
    ate = synthetic.ate_rmse(est, rel)
    assert ate < 0.2, f"post-eviction drift {ate:.3f} m"
    # the rebased graph still solves: full dense GN stays finite and keeps
    # the surviving chain consistent with its measurements
    res = solver.solve(state.graph, state.graph.pose_mask, iterations=3)
    assert np.isfinite(np.asarray(res.graph.poses)).all()
    assert float(res.chi2) < 1.0


def test_prior_rebase_anchors_survivor():
    """After eviction the prior anchors the new keyframe 0 near its estimate
    with ~the original prior strength (variance sum, I_bt >> I_prior)."""
    cfg = tiny_config(max_keyframes=4)
    _, state, _ = run_mission(cfg, n_scans=6)
    prior_pose = np.asarray(state.graph.prior_pose)
    pose0 = np.asarray(state.graph.poses[0])
    assert np.linalg.norm(prior_pose[3:] - pose0[3:]) < 0.3
    prior_var = 1.0 / np.asarray(state.graph.prior_info)
    orig_var = np.asarray(cfg.keyframe.prior_sigmas)
    # within 2x of the original prior variances (sum adds the tiny bt var)
    assert (prior_var <= 2.05 * orig_var + 1e-3).all()
    assert (prior_var >= 0.999 * orig_var - 1e-3).all()


def test_eviction_remaps_loop_and_gps_factors():
    """_evict_oldest index bookkeeping: loop/GPS factors keep pointing at
    the same physical keyframes after the shift; factors touching the
    evicted pose are dropped (their constraint is absorbed into the rebased
    prior)."""
    cfg = tiny_config(max_keyframes=8)
    state = lio.init_state(cfg)
    K = 8
    poses = np.zeros((K, 6), np.float32)
    poses[:, 3] = np.arange(K, dtype=np.float32)
    g = state.graph
    # full chain 0..7 + a loop factor (2 <-> 5) in the loop region + GPS@1
    bt_i = np.asarray(g.bt_i).copy(); bt_j = np.asarray(g.bt_j).copy()
    bt_mask = np.asarray(g.bt_mask).copy()
    bt_i[:K - 1] = np.arange(K - 1); bt_j[:K - 1] = np.arange(1, K)
    bt_mask[:K - 1] = True
    loop_slot = K - 1
    bt_i[loop_slot], bt_j[loop_slot], bt_mask[loop_slot] = 2, 5, True
    g = g._replace(
        poses=jnp.asarray(poses), pose_mask=jnp.ones(K, bool),
        bt_i=jnp.asarray(bt_i), bt_j=jnp.asarray(bt_j),
        bt_mask=jnp.asarray(bt_mask),
        gps_i=g.gps_i.at[0].set(1), gps_mask=g.gps_mask.at[0].set(True),
        prior_info=jnp.asarray(
            np.asarray(lio.F.info_from_variances(cfg.keyframe.prior_sigmas))))
    store = state.store._replace(poses=jnp.asarray(poses),
                                 stamps=jnp.arange(K, dtype=jnp.float32),
                                 count=jnp.int32(K))
    state = state._replace(graph=g, store=store,
                           sc_db=state.sc_db._replace(count=jnp.int32(K)))

    evicted = jax.jit(lio._evict_oldest)(state)
    assert int(evicted.store.count) == K - 1
    eg = evicted.graph
    # chain re-established: slot i = factor i -> i+1 over the survivors
    for i in range(K - 2):
        assert bool(eg.bt_mask[i]) and int(eg.bt_i[i]) == i \
            and int(eg.bt_j[i]) == i + 1
    assert not bool(eg.bt_mask[K - 2])          # vacated for the next save
    # loop factor follows its keyframes: (2,5) -> (1,4)
    assert bool(eg.bt_mask[loop_slot])
    assert int(eg.bt_i[loop_slot]) == 1 and int(eg.bt_j[loop_slot]) == 4
    # GPS factor @1 -> @0
    assert bool(eg.gps_mask[0]) and int(eg.gps_i[0]) == 0
    # prior re-anchored on the survivor (old pose 1)
    np.testing.assert_allclose(np.asarray(eg.prior_pose), poses[1], atol=1e-6)

    # two more evictions: GPS@0 dropped, loop (1,4)->(0,3) then dropped
    ev2 = jax.jit(lio._evict_oldest)(evicted)
    assert not bool(ev2.graph.gps_mask[0])
    assert bool(ev2.graph.bt_mask[loop_slot])
    assert int(ev2.graph.bt_i[loop_slot]) == 0 and int(ev2.graph.bt_j[loop_slot]) == 3
    ev3 = jax.jit(lio._evict_oldest)(ev2)
    assert not bool(ev3.graph.bt_mask[loop_slot])


@pytest.mark.slow
def test_long_mission_soak():
    """Endurance: a mission ~5x the store capacity (the reference's field
    logs run 895 s unbounded, README.md:232-239).  Eviction churn must not
    degrade consistency or accumulate drift."""
    cfg = tiny_config(max_keyframes=24)
    seq, state, outs = run_mission(cfg, n_scans=120)
    assert int(state.evict_count) >= 90
    assert_graph_consistent(state, cfg)
    est = np.stack([np.asarray(o.pose) for o in outs])
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                                 jnp.asarray(p)))
                    for p in seq.poses])
    ate = synthetic.ate_rmse(est, rel)
    assert ate < 0.5, f"soak drift {ate:.3f} m"
    res = solver.solve(state.graph, state.graph.pose_mask, iterations=3)
    assert np.isfinite(np.asarray(res.graph.poses)).all()
    assert float(res.chi2) < 1.0


def test_gps_slot_ring_recycles_oldest():
    """GPS factors ring-allocate at capacity (oldest recycled) instead of
    clamping onto the last slot (round-2 verdict silent-clamp family)."""
    cfg = tiny_config(max_keyframes=16)
    cfg = Config(static=cfg.static, registration=cfg.registration,
                 keyframe=cfg.keyframe,
                 gps=GpsConfig(use_gps=True, pose_cov_threshold=0.0,
                               min_travel_before_gps=0.0,
                               gps_distance_frequency=0.0))
    state = lio.init_state(cfg)
    # live region only: the tail slots are reserved for archive anchors
    # (round-4 verdict weak #5) and must never be touched by live fixes
    G = state.graph.gps_i.shape[0] - cfg.static.max_archive_anchors
    # a straight-line store so the travel/spacing gates pass
    K = cfg.static.max_keyframes
    poses = np.zeros((K, 6), np.float32)
    poses[:, 3] = np.arange(K) * 5.0
    state = state._replace(store=state.store._replace(
        poses=jnp.asarray(poses), count=jnp.int32(K)))

    for k in range(G + 3):
        inp = lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.zeros((4, 3)), mask=jnp.zeros(4, bool)),
            stamp=jnp.float32(k), init_guess=jnp.zeros(6),
            guess_valid=jnp.asarray(False), imu_rpy=jnp.zeros(3),
            imu_available=jnp.asarray(False),
            gps_pos=jnp.asarray([k * 5.0, 0.0, 0.0], jnp.float32),
            gps_info=jnp.ones(3), gps_valid=jnp.asarray(True))
        state = lio._add_gps_factor(state, inp, jnp.int32(k % K), cfg,
                                        lio.default_map_ops(cfg))

    # k=0 fails the strict traveled>0 gate; k=1..G+2 all add -> G+2 factors
    assert int(state.gps_count) == G + 2
    gps_i = np.asarray(state.graph.gps_i)
    # slots 0 and 1 were recycled by the 2 overflow factors (ring), so they
    # hold the NEWEST keyframe indices; slot 2 still holds its first writer
    assert gps_i[0] == G + 1 and gps_i[1] == G + 2 and gps_i[2] == 3
    assert np.asarray(state.graph.gps_mask[:G]).all()
    # the reserved anchor region stays untouched by live GPS overflow
    assert not np.asarray(state.graph.gps_mask[G:]).any()
