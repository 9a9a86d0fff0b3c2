"""Relocalization: build a map, checkpoint it, relocate a fresh scan."""

import numpy as np
import jax.numpy as jnp
import pytest

# full corner/relocalization e2e is minutes-scale on 2 CPU cores; the
# fast default suite keeps unit-level coverage (run with -m "")
pytestmark = pytest.mark.slow

from lio_slam_tpu.config import (Config, LoopClosureConfig, RegistrationConfig,
                                 StaticConfig)
from lio_slam_tpu.io import synthetic
from lio_slam_tpu.pipeline import lio, relocalization
from lio_slam_tpu.utils import pointcloud as pc, se3


def cfg_small():
    return Config(
        static=StaticConfig(max_raw_points=4096, max_scan_points=4096,
                            max_map_points=16384, max_keyframes=32,
                            max_keyframe_points=2048, max_loop_queue=2,
                            max_gps_queue=2, window_size=8,
                            icp_submap_points=8192),
        registration=RegistrationConfig(degeneracy_eig_thresh=10.0),
        loop=LoopClosureConfig(search_num=3),
        keyframe=__import__("lio_slam_tpu.config", fromlist=["KeyframeConfig"]
                            ).KeyframeConfig(dist_threshold=0.5),
    )


@pytest.fixture(scope="module")
def mapped_state():
    cfg = cfg_small()
    seq = synthetic.make_sequence(n_scans=12, n_points=4096, seed=0, speed=3.0)
    step = lio.make_lio_step(cfg)
    state = lio.init_state(cfg)
    prev = None
    for i in range(12):
        if i == 0:
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
    return cfg, state, seq


def test_relocalize_known_place(mapped_state):
    cfg, state, seq = mapped_state
    assert int(state.store.count) >= 4
    reloc = relocalization.make_relocalizer(cfg)
    # observe the world again from near the pose of scan 5, yawed 20 degrees
    true_rel = np.asarray(se3.pose6_between(jnp.asarray(seq.poses[0]),
                                            jnp.asarray(seq.poses[5])))
    offset = np.array([0, 0, 0.35, 0.3, -0.2, 0.0], np.float32)
    query_pose_map = np.asarray(se3.pose6_compose(jnp.asarray(true_rel),
                                                  jnp.asarray(offset)))
    # world-frame pose of the query = truth pose 5 composed with the offset
    world_pose = np.asarray(se3.pose6_compose(jnp.asarray(seq.poses[5]),
                                              jnp.asarray(offset)))
    rs = np.random.RandomState(9)
    scan, mask = synthetic.observe(seq.world, world_pose, 4096, rng=rs)
    res = reloc(state, pc.Cloud(xyz=jnp.asarray(scan), mask=jnp.asarray(mask)))
    assert bool(res.success), (float(res.sc_distance), float(res.fitness))
    err = np.abs(np.asarray(res.pose) - query_pose_map)
    err[2] = (err[2] + np.pi) % (2 * np.pi) - np.pi
    assert np.abs(err[3:]).max() < 0.3, err
    assert abs(err[2]) < 0.1, err


def test_relocalize_rejects_unknown_place(mapped_state):
    cfg, state, seq = mapped_state
    reloc = relocalization.make_relocalizer(cfg)
    # a scene that is not in the map: a wedge world
    rs = np.random.RandomState(3)
    ang = rs.uniform(0, np.pi / 4, 4096)
    r = rs.uniform(3, 60, 4096)
    scan = np.stack([r * np.cos(ang), r * np.sin(ang), r * 0.1], 1).astype(np.float32)
    res = reloc(state, pc.Cloud(xyz=jnp.asarray(scan), mask=jnp.ones(4096, bool)))
    assert not bool(res.success)
