import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from lio_slam_tpu.config import Config, StaticConfig, RegistrationConfig
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.pipeline import checkpoint, imu_frontend as fe, lio
from lio_slam_tpu.utils import pointcloud as pc, se3


def cfg_small():
    return Config(
        static=StaticConfig(max_raw_points=2048, max_scan_points=2048,
                            max_map_points=8192, max_keyframes=16,
                            max_keyframe_points=1024, max_loop_queue=2,
                            max_gps_queue=2, window_size=8),
        registration=RegistrationConfig(degeneracy_eig_thresh=10.0))


def run_scans(cfg, state, n, start=0, prev=None):
    seq = synthetic.make_sequence(n_scans=start + n, n_points=2048, seed=0)
    step = lio.make_lio_step(cfg)
    for i in range(start, start + n):
        if i == 0 or prev is None:
            guess, gvalid = np.zeros(6, np.float32), False
        else:
            inc = se3.pose6_between(jnp.asarray(seq.poses[i - 1]),
                                    jnp.asarray(seq.poses[i]))
            guess = np.asarray(se3.pose6_compose(jnp.asarray(prev), inc))
            gvalid = True
        inp = lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.asarray(seq.scans[i]),
                           mask=jnp.asarray(seq.scan_masks[i])),
            stamp=jnp.float32(seq.stamps[i]), init_guess=jnp.asarray(guess),
            guess_valid=jnp.asarray(gvalid), imu_rpy=jnp.asarray(seq.imu_rpy[i]),
            imu_available=jnp.asarray(True), gps_pos=jnp.zeros(3),
            gps_info=jnp.zeros(3), gps_valid=jnp.asarray(False))
        state, out = step(state, inp)
        prev = np.asarray(out.pose)
    return state, prev


def test_roundtrip_and_resume(tmp_path):
    cfg = cfg_small()
    state, prev = run_scans(cfg, lio.init_state(cfg), 6)
    imu = fe.init_state()
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(p, state, imu, metadata={"scan": 6})

    state2, imu2, meta = checkpoint.load_checkpoint(p, cfg)
    assert meta["scan"] == 6
    np.testing.assert_allclose(np.asarray(state2.store.poses),
                               np.asarray(state.store.poses), atol=0)
    assert int(state2.store.count) == int(state.store.count)
    np.testing.assert_allclose(np.asarray(state2.map_grid.counts),
                               np.asarray(state.map_grid.counts), atol=0)

    # resumed run continues: process 3 more scans without divergence
    state3, prev3 = run_scans(cfg, state2, 3, start=6, prev=prev)
    assert np.isfinite(prev3).all()
    assert int(state3.store.count) >= int(state.store.count)


def test_capacity_mismatch_raises(tmp_path):
    cfg = cfg_small()
    state, _ = run_scans(cfg, lio.init_state(cfg), 2)
    p = str(tmp_path / "c.npz")
    checkpoint.save_checkpoint(p, state)
    bigger = dataclasses.replace(
        cfg, static=dataclasses.replace(cfg.static, max_keyframes=32))
    with pytest.raises(ValueError, match="shape"):
        checkpoint.load_checkpoint(p, bigger)


def test_atomic_write(tmp_path):
    cfg = cfg_small()
    state = lio.init_state(cfg)
    p = str(tmp_path / "a.npz")
    checkpoint.save_checkpoint(p, state)
    checkpoint.save_checkpoint(p, state)     # overwrite cleanly
    s2, imu2, _ = checkpoint.load_checkpoint(p, cfg)
    assert imu2 is None
