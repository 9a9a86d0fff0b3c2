"""Whole-pipeline on-device replay (pipeline/replay.py): the honest
benchmark program — deskew + front-end guesses + mapping + loop cadence +
TransformFusion under one jit, no oracle inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from lio_slam_tpu.config import Config, RegistrationConfig, StaticConfig
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.pipeline import imu_frontend as fe
from lio_slam_tpu.pipeline import lio, replay
from lio_slam_tpu.utils import se3


def _cfg():
    return Config(
        static=StaticConfig(max_raw_points=2048, max_scan_points=2048,
                            max_map_points=8192, max_keyframes=16,
                            max_keyframe_points=1024, max_loop_queue=2,
                            max_gps_queue=2, window_size=8, max_imu_window=16),
        registration=RegistrationConfig(degeneracy_eig_thresh=10.0))


def _batch(seq, cfg, n):
    W = cfg.static.max_imu_window
    acc, gyr, dts, rel_t, imask = synthetic.make_imu_windows(
        seq, W, samples_per_scan=8, gravity=cfg.imu.gravity)
    P = cfg.static.max_raw_points
    return replay.ReplayBatch(
        xyz=jnp.asarray(seq.scans[:n]),
        ptime=jnp.zeros((n, P), jnp.float32),
        pmask=jnp.asarray(seq.scan_masks[:n]),
        ring=jnp.zeros((n, P), jnp.int32),
        acc=jnp.asarray(acc[:n]), gyr=jnp.asarray(gyr[:n]),
        dts=jnp.asarray(dts[:n]), rel_t=jnp.asarray(rel_t[:n]),
        imask=jnp.asarray(imask[:n]),
        stamp=jnp.asarray(seq.stamps[:n]))


def test_replay_tracks_without_oracle_guesses():
    cfg = _cfg()
    n = 10
    seq = synthetic.make_sequence(n_scans=n, n_points=2048, seed=0)
    run = replay.make_pipeline_replay(cfg, loop_every=4)
    state, fes, outs = run(lio.init_state(cfg), fe.init_state(),
                           _batch(seq, cfg, n))
    jax.block_until_ready(outs)
    poses = np.asarray(outs.poses)
    assert np.isfinite(poses).all()
    # trajectory tracks truth (est frame anchored at first pose); guesses are
    # front-end predictions so the tolerance is looser than the oracle bench
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                                 jnp.asarray(p)))
                    for p in seq.poses[:n]])
    ate = synthetic.ate_rmse(poses, rel)
    assert ate < 0.15, f"ATE {ate}"
    # the iteration probe is live (some scan took >1 GN iteration)
    iters = np.asarray(outs.iters)
    assert iters.max() >= 1
    assert np.isfinite(np.asarray(outs.fused_last)).all()
    # front-end initialized and healthy
    assert bool(fes.initialized)
    assert not bool(fes.failure)


def test_replay_matches_repeat_run():
    """Determinism: same inputs -> identical trajectory (pure function)."""
    cfg = _cfg()
    n = 6
    seq = synthetic.make_sequence(n_scans=n, n_points=2048, seed=2)
    run = replay.make_pipeline_replay(cfg, loop_every=0)
    b = _batch(seq, cfg, n)
    _, _, o1 = run(lio.init_state(cfg), fe.init_state(), b)
    _, _, o2 = run(lio.init_state(cfg), fe.init_state(), b)
    np.testing.assert_array_equal(np.asarray(o1.poses), np.asarray(o2.poses))


def test_chunked_replay_runs_and_tracks():
    """ChunkedReplay: same per-scan program with detector/correction at the
    chunk boundary — must track like the monolith (not bitwise: the monolith
    applies the detector inside the scan at idx%L==L-1, the chunked form at
    the chunk edge; same cadence, same programs)."""
    cfg = _cfg()
    n = 8
    seq = synthetic.make_sequence(n_scans=n, n_points=2048, seed=0)
    cr = replay.ChunkedReplay(cfg, loop_every=4)
    chunks = cr.split(_batch(seq, cfg, n))
    assert len(chunks) == 2
    state, fes = cr.init()
    state, fes, outs = cr.run(state, fes, chunks)
    poses = np.asarray(outs.poses)
    assert poses.shape == (n, 6)
    assert np.isfinite(poses).all()
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                                 jnp.asarray(p)))
                    for p in seq.poses[:n]])
    assert synthetic.ate_rmse(poses, rel) < 0.15


def test_host_driven_replay_matches_chunked():
    """HostDrivenReplay (per-scan async dispatch of the stage programs)
    must track like the chunked form — same programs, same cadence."""
    cfg = _cfg()
    n = 8
    seq = synthetic.make_sequence(n_scans=n, n_points=2048, seed=0)
    hd = replay.HostDrivenReplay(cfg, loop_every=4)
    state, fes = hd.init()
    state, fes, outs = hd.run(state, fes, hd.split(_batch(seq, cfg, n)))
    poses = np.asarray(outs.poses)
    assert poses.shape == (n, 6) and np.isfinite(poses).all()
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                                 jnp.asarray(p)))
                    for p in seq.poses[:n]])
    assert synthetic.ate_rmse(poses, rel) < 0.15
    assert np.isfinite(np.asarray(outs.fused_last)).all()
