"""Map products: rolling local planning map, global map export, height map.

Rebuild of the reference's output stages:

- `publishLocalMap` (`mapOptmization.cpp:2442-2552`): accumulate the last-N
  keyframe clouds, crop to a yaw-aligned box around the vehicle (PassThrough
  X/Y in the rotated frame, :2502-2506), statistical-outlier-removal, voxel
  downsample -> `liorf/mapping/map_4planning`.
- `saveMapService` (:918-971): export trajectory + global map PCDs (invoked
  by the service and at shutdown when savePCD).
- the grid_map height-map node (ops/heightmap.py) consumes the planning map.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from lio_slam_tpu.config import Config
from lio_slam_tpu.io import pcd as pcd_io
from lio_slam_tpu.ops import heightmap as hm
from lio_slam_tpu.ops import voxel_grid as vg
from lio_slam_tpu.pipeline import keyframes as kfm
from lio_slam_tpu.utils import pointcloud as pc
from lio_slam_tpu.utils import se3


def statistical_outlier_mask(xyz: jax.Array, mask: jax.Array,
                             mean_k: int = 5, stddev_mul: float = 1.0,
                             cell: float = 2.0, table: int = 8192) -> jax.Array:
    """pcl::StatisticalOutlierRemoval: per-point mean distance to k
    neighbours; drop points whose mean exceeds global mean + stddev_mul*std."""
    grid = vg.build_grid(xyz, mask, cell, table, 32)
    nn = vg.query_knn(grid, xyz, mask, k=mean_k + 1)   # +1: self
    d = jnp.sqrt(jnp.maximum(nn.dist2, 0.0))
    d = jnp.where(nn.valid, d, 0.0)
    n_nb = jnp.sum(nn.valid, axis=1)
    mean_d = jnp.sum(d, axis=1) / jnp.maximum(n_nb - 1, 1)   # self dist = 0
    # a point without k neighbours within the grid radius is isolated — PCL's
    # kd-tree would report huge distances for it; drop it outright
    has_k = n_nb >= (mean_k + 1)
    valid = mask & has_k
    mu = jnp.sum(jnp.where(valid, mean_d, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    var = jnp.sum(jnp.where(valid, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    thresh = mu + stddev_mul * jnp.sqrt(var)
    return valid & (mean_d <= thresh)


def make_local_map_fn(cfg: Config):
    o = cfg.output
    s = cfg.static

    @jax.jit
    def local_planning_map(store: kfm.KeyframeStore, pose6: jax.Array) -> pc.Cloud:
        """The map_4planning product around the current pose."""
        K = store.poses.shape[0]
        # last-N keyframes (publishLocalMap takes the most recent ones)
        idx0 = jnp.maximum(store.count - o.local_map_keyframes, 0)
        take_idx = jnp.clip(idx0 + jnp.arange(o.local_map_keyframes), 0, K - 1)
        valid_kf = take_idx < store.count
        poses = store.poses[take_idx]
        clouds = store.clouds[take_idx]
        masks = store.cloud_masks[take_idx] & valid_kf[:, None]
        R, t = se3.pose6_to_Rt(poses)
        world = jnp.einsum("sij,spj->spi", R, clouds) + t[:, None, :]
        flat = world.reshape(-1, 3)
        fmask = masks.reshape(-1)
        # yaw-aligned box crop about the vehicle (:2502-2506)
        yaw = pose6[2]
        c, sn = jnp.cos(-yaw), jnp.sin(-yaw)
        rel = flat[:, :2] - pose6[3:5][None, :]
        xr = rel[:, 0] * c - rel[:, 1] * sn
        yr = rel[:, 0] * sn + rel[:, 1] * c
        bx, by = o.local_map_box
        fmask = fmask & (jnp.abs(xr) <= bx) & (jnp.abs(yr) <= by)
        # SOR + voxel downsample
        cloud = pc.Cloud(xyz=flat, mask=fmask)
        ds = pc.voxel_downsample(cloud, o.global_map_leaf_size, s.max_map_points)
        sor = statistical_outlier_mask(ds.xyz, ds.mask, o.sor_mean_k, o.sor_stddev)
        return ds._replace(mask=sor)

    @jax.jit
    def height_map(planning_cloud: pc.Cloud, pose6: jax.Array) -> hm.HeightMap:
        return hm.rasterize(planning_cloud.xyz, planning_cloud.mask,
                            pose6[3:5], o.heightmap_resolution,
                            tuple(o.heightmap_size))

    return local_planning_map, height_map


class SaveMapResult(NamedTuple):
    success: bool
    num_points: int
    files: list


def save_map(store: kfm.KeyframeStore, destination: str,
             resolution: float = 0.0) -> SaveMapResult:
    """saveMapService (:918-971): write trajectory + transformations + global
    map PCDs.  `resolution > 0` voxel-downsamples the global map first."""
    n_kf = int(store.count)
    if n_kf == 0:
        return SaveMapResult(success=False, num_points=0, files=[])
    os.makedirs(destination, exist_ok=True)
    poses = np.asarray(store.poses[:n_kf])
    files = []

    # trajectory.pcd: keyframe positions (intensity = keyframe index)
    traj_path = os.path.join(destination, "trajectory.pcd")
    pcd_io.save_pcd(traj_path, poses[:, 3:6], intensity=np.arange(n_kf))
    files.append(traj_path)
    # transformations.pcd: full 6-DoF keyframe poses as PointTypePose rows
    # (x/y/z/intensity=index/roll/pitch/yaw/time — the reference's
    # cloudKeyPoses6D export, mapOptmization.cpp:928-932); the npz sidecar
    # stays for array-friendly consumers
    tf_path = os.path.join(destination, "transformations.pcd")
    stamps = np.asarray(store.stamps[:n_kf], np.float32)
    pcd_io.save_pcd(tf_path, poses[:, 3:6], intensity=np.arange(n_kf),
                    extra_fields={"roll": poses[:, 0], "pitch": poses[:, 1],
                                  "yaw": poses[:, 2], "time": stamps})
    np.savez(os.path.join(destination, "transformations.npz"), poses=poses)
    files.append(tf_path)

    # global map: transform every keyframe cloud (batched on device)
    world = np.asarray(kfm.transform_keyframe_clouds(store)[:n_kf])
    masks = np.asarray(store.cloud_masks[:n_kf])
    pts = world[masks]
    if resolution > 0:
        cloud = pc.pad_cloud(pts, int(2 ** np.ceil(np.log2(max(len(pts), 2)))))
        ds = pc.voxel_downsample(cloud, resolution, cloud.capacity)
        pts = np.asarray(ds.xyz[np.asarray(ds.mask)])
    # SurfMap.pcd: the accumulated surf-feature map (:950-952).  The liorf
    # pipeline is surf-only (SURVEY §2.1 #4) so the surf map IS the global
    # map; both files are written for downstream-tool parity.
    sm_path = os.path.join(destination, "SurfMap.pcd")
    pcd_io.save_pcd(sm_path, pts)
    files.append(sm_path)
    gm_path = os.path.join(destination, "GlobalMap.pcd")
    pcd_io.save_pcd(gm_path, pts)
    files.append(gm_path)
    return SaveMapResult(success=True, num_points=len(pts), files=files)
