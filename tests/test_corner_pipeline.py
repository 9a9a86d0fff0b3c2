"""LOAM corner (point-to-line) path wired into the pipeline.

VERDICT round-1 item 2: the op-level corner registration existed but the
mission path was surf-only.  These tests drive the wired path:
Runner-prep range-image extraction (featureExtraction.cpp:141-237 semantics)
and the lio_step surf+corner registration with corner keyframe clouds +
corner local map (upstream LIO-SAM's cornerCloudKeyFrames, which the liorf
fork dropped — SURVEY.md §2.1 #4)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

# full corner/relocalization e2e is minutes-scale on 2 CPU cores; the
# fast default suite keeps unit-level coverage (run with -m "")
pytestmark = pytest.mark.slow

from lio_slam_tpu.config import (Config, LidarConfig, RegistrationConfig,
                                 StaticConfig)
from lio_slam_tpu.io import formats, synthetic
from lio_slam_tpu.pipeline import lio
from lio_slam_tpu.pipeline.runner import Runner
from lio_slam_tpu.utils import pointcloud as pc, se3

# vertical box-building edges of synthetic.make_world (box corners, z 0..h)
_BOXES = [(-20, -20, 8, 6), (15, 10, 10, 5), (-10, 25, 6, 7),
          (25, -25, 7, 4), (0, -35, 9, 5)]


def make_edge_world(pts_per_edge=60):
    edges = []
    for bx, by, w, h in _BOXES:
        for cx, cy in [(bx, by), (bx + w, by), (bx, by + w), (bx + w, by + w)]:
            z = np.linspace(0.0, h, pts_per_edge, dtype=np.float32)
            edges.append(np.stack([np.full_like(z, cx), np.full_like(z, cy), z], 1))
    return np.concatenate(edges)


def observe_edges(edge_world, pose6, capacity, max_range=40.0, noise=0.01,
                  rng=None):
    rng = rng or np.random.RandomState(0)
    R, t = se3.pose6_to_Rt(jnp.asarray(pose6))
    Ri, ti = se3.inverse(R, t)
    d = np.linalg.norm(edge_world - np.asarray(t)[None, :], axis=1)
    sel = np.where(d < max_range)[0][:capacity]
    body = np.asarray(se3.transform_points(Ri, ti, jnp.asarray(edge_world[sel])))
    body = body + rng.randn(*body.shape).astype(np.float32) * noise
    out = np.zeros((capacity, 3), np.float32)
    out[:len(sel)] = body
    mask = np.zeros(capacity, bool)
    mask[:len(sel)] = True
    return out, mask


def corner_config():
    return Config(
        static=StaticConfig(
            max_raw_points=4096, max_scan_points=4096, max_map_points=16384,
            max_keyframes=64, max_keyframe_points=2048,
            max_loop_queue=4, max_gps_queue=4, window_size=16,
            max_corner_points=256, max_corner_map_points=4096),
        registration=RegistrationConfig(use_corner_features=True),
    )


@pytest.fixture(scope="module")
def corner_run():
    cfg = corner_config()
    n = 15
    poses, stamps = synthetic.make_trajectory(n, speed=2.0, yaw_rate=0.1)
    world = synthetic.make_world(seed=0, extent=40.0, n_per_surface=40000)
    edge_world = make_edge_world()
    rs = np.random.RandomState(7)
    step = lio.make_lio_step(cfg)
    state = lio.init_state(cfg)
    prev = None
    est = []
    for i in range(n):
        scan, mask = synthetic.observe(world, poses[i], 4096, rng=rs)
        cxyz, cmask = observe_edges(edge_world, poses[i],
                                    cfg.static.max_corner_points, rng=rs)
        if i == 0:
            guess = np.zeros(6, np.float32); gvalid = False
        else:
            inc = se3.pose6_between(jnp.asarray(poses[i - 1]),
                                    jnp.asarray(poses[i]))
            guess = np.asarray(se3.pose6_compose(jnp.asarray(prev), inc))
            gvalid = True
        inp = lio.ScanInput(
            cloud=pc.Cloud(xyz=jnp.asarray(scan), mask=jnp.asarray(mask)),
            stamp=jnp.float32(stamps[i]), init_guess=jnp.asarray(guess),
            guess_valid=jnp.asarray(gvalid),
            imu_rpy=jnp.asarray(poses[i, :3]), imu_available=jnp.asarray(True),
            gps_pos=jnp.zeros(3), gps_info=jnp.zeros(3),
            gps_valid=jnp.asarray(False),
            corner=pc.Cloud(xyz=jnp.asarray(cxyz), mask=jnp.asarray(cmask)))
        state, out = step(state, inp)
        prev = np.asarray(out.pose)
        est.append(prev)
    return cfg, state, np.stack(est), poses


def test_corner_e2e_tracks(corner_run):
    cfg, state, est, poses = corner_run
    rel = np.stack([np.asarray(se3.pose6_between(jnp.asarray(poses[0]),
                                                 jnp.asarray(p)))
                    for p in poses])
    ate = synthetic.ate_rmse(est, rel)
    assert ate < 0.15, f"surf+corner ATE {ate:.3f}"


def test_corner_keyframes_stored(corner_run):
    cfg, state, est, poses = corner_run
    n_kf = int(state.store.count)
    assert n_kf >= 2
    # corner clouds landed in the store with the configured capacity
    assert state.store.corner_clouds.shape[1] == cfg.static.max_corner_points
    per_kf = np.asarray(state.store.corner_masks[:n_kf]).sum(1)
    assert (per_kf > 10).all(), f"corner clouds missing in store: {per_kf}"


def test_corner_map_assembly(corner_run):
    from lio_slam_tpu.pipeline import keyframes as kfm
    cfg, state, est, poses = corner_run
    cm = kfm.assemble_corner_map(
        state.store, jnp.asarray(est[-1][3:]), jnp.float32(100.0),
        radius=50.0, recent_sec=1e9,
        leaf_size=cfg.registration.mapping_corner_leaf_size,
        max_selected=16, map_capacity=cfg.static.max_corner_map_points)
    n = int(np.asarray(cm.mask).sum())
    assert n > 50
    # every corner-map point is near a true vertical edge line (xy distance)
    pts = np.asarray(cm.xyz)[np.asarray(cm.mask)]
    corners_xy = np.array([(c[0], c[1]) for bx, by, w, h in _BOXES
                           for c in [(bx, by), (bx + w, by), (bx, by + w),
                                     (bx + w, by + w)]])
    d = np.linalg.norm(pts[:, None, :2] - corners_xy[None], axis=-1).min(1)
    assert np.median(d) < 0.3, f"corner map off the true edges: median {np.median(d):.2f}"


def test_surf_only_unaffected_by_corner_fields():
    """Surf-only configs carry capacity-1 corner tensors; a ScanInput without
    `corner` (e.g. bench.py's batched input) still runs."""
    cfg = corner_config().replace(
        registration=RegistrationConfig(use_corner_features=False))
    state = lio.init_state(cfg)
    assert state.store.corner_clouds.shape[1] == 1
    step = lio.make_lio_step(cfg)
    world = synthetic.make_world(seed=0, extent=40.0, n_per_surface=20000)
    scan, mask = synthetic.observe(world, np.zeros(6, np.float32), 4096)
    inp = lio.ScanInput(
        cloud=pc.Cloud(xyz=jnp.asarray(scan), mask=jnp.asarray(mask)),
        stamp=jnp.float32(0.0), init_guess=jnp.zeros(6),
        guess_valid=jnp.asarray(False), imu_rpy=jnp.zeros(3),
        imu_available=jnp.asarray(False), gps_pos=jnp.zeros(3),
        gps_info=jnp.zeros(3), gps_valid=jnp.asarray(False))
    state, out = step(state, inp)
    assert np.isfinite(np.asarray(out.pose)).all()


def room_scan(n_scan=16, horizon=360, half=8.0, stamp=0.0):
    """Ring-structured scan of a square room: 4 walls + ceiling-less box.
    The 4 vertical wall-intersection lines are the corner features."""
    rows, cols = np.meshgrid(np.arange(n_scan), np.arange(horizon),
                             indexing="ij")
    # beams at column CENTERS so the projection re-bins them exactly (real
    # sensors emit near-uniform azimuth; quantization-jitter holes are a
    # synthetic artifact that would add noise edges below the occlusion gate)
    az = (cols + 0.5) / horizon * 2 * np.pi - np.pi
    elev = (rows / (n_scan - 1) - 0.2) * np.deg2rad(30.0)
    # distance to the square-room wall along azimuth
    ca, sa = np.cos(az), np.sin(az)
    r_wall = half / np.maximum(np.abs(ca), np.abs(sa))
    x = (r_wall * ca).astype(np.float32)
    y = (r_wall * sa).astype(np.float32)
    z = (r_wall * np.tan(elev)).astype(np.float32) + 1.0
    xyz = np.stack([x, y, z], -1).reshape(-1, 3)
    ring = rows.reshape(-1).astype(np.uint16)
    t = (cols.reshape(-1) / horizon * 0.1).astype(np.float32)
    return formats.StandardScan(
        xyz=xyz, intensity=np.ones(len(xyz), np.float32), ring=ring,
        time=t, stamp=stamp)


def test_runner_prep_extracts_corners():
    cfg = corner_config().replace(
        lidar=LidarConfig(n_scan=16, horizon_scan=360, lidar_min_range=1.0,
                          lidar_max_range=50.0))
    runner = Runner(cfg, loop_every=100)
    scan = room_scan()
    xyz_p, t_p, mask_p, ring_p = runner._pad_raw(scan)
    W = cfg.static.max_imu_window
    cloud, corner = runner._prep(xyz_p, t_p, mask_p, ring_p,
                                 jnp.zeros((W, 3)), jnp.zeros(W),
                                 jnp.zeros(W, bool), jnp.asarray(False))
    assert corner is not None
    cmask = np.asarray(corner.mask)
    n_corners = int(cmask.sum())
    assert n_corners > 8, f"too few corners extracted: {n_corners}"
    # corners concentrate at the 4 vertical wall intersections (|x|=|y|=half)
    pts = np.asarray(corner.xyz)[cmask]
    wall_corners = np.array([[8, 8], [8, -8], [-8, 8], [-8, -8]], np.float32)
    d = np.linalg.norm(pts[:, None, :2] - wall_corners[None], axis=-1).min(1)
    frac_near = float((d < 1.0).mean())
    assert frac_near > 0.5, f"corners not at wall intersections ({frac_near:.2f} near)"


def test_runner_corner_scan_processes():
    """Full process_scan with corners enabled runs and returns a finite pose."""
    cfg = corner_config().replace(
        lidar=LidarConfig(n_scan=16, horizon_scan=360, lidar_min_range=1.0,
                          lidar_max_range=50.0))
    runner = Runner(cfg, loop_every=100)
    for i in range(2):
        r = runner.process_scan(room_scan(stamp=float(i) * 0.1))
        assert r is not None
        assert np.isfinite(r.pose).all()
    assert int(runner.state.store.count) >= 1
    assert int(np.asarray(runner.state.store.corner_masks[0]).sum()) > 0
