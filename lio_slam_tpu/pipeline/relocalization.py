"""Relocalization in a previously built map.

The reference intends this but never implements it: `common_lib::remapping`
returns -1 (`lib/common_lib.cpp:38-43`) and mapOptimization carries a
"TODO remapping" (`mapOptmization.cpp:443-447`).  Here it works:

1. place recognition: Scan Context descriptor of the query scan against the
   saved keyframe descriptor DB (`ops/scancontext.py`),
2. pose refinement: point-to-plane registration of the query scan against a
   submap around the matched keyframe, initialized with the SC yaw.

Typical use: load a mission checkpoint (`pipeline/checkpoint.py`), call
`relocalize` with a fresh scan, then seed a new `LioState`/Runner at the
returned pose to continue mapping in the old map's frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lio_slam_tpu.config import Config
from lio_slam_tpu.ops import registration as reg
from lio_slam_tpu.ops import scancontext as sc
from lio_slam_tpu.pipeline import lio as lio_mod
from lio_slam_tpu.pipeline.loop_closure import _submap_around
from lio_slam_tpu.utils import pointcloud as pc
from lio_slam_tpu.utils import se3


class RelocResult(NamedTuple):
    success: jax.Array      # () bool
    pose: jax.Array         # (6,) pose in the map frame (valid when success)
    matched_kf: jax.Array   # () int32 keyframe index (-1 if none)
    sc_distance: jax.Array  # () descriptor distance
    fitness: jax.Array      # () registration mean residual


def make_relocalizer(cfg: Config):
    l = cfg.loop
    s = cfg.static

    @jax.jit
    def relocalize(state: lio_mod.LioState, scan: pc.Cloud) -> RelocResult:
        """Find the pose of a body-frame `scan` within `state`'s map."""
        scan_ds = pc.voxel_downsample(scan, cfg.registration.mapping_surf_leaf_size,
                                      s.max_scan_points)
        desc = sc.make_descriptor(
            scan_ds.xyz, scan_ds.mask,
            max_radius=l.sc_max_radius, lidar_height=l.sc_lidar_height,
            num_ring=s.sc_num_ring, num_sector=s.sc_num_sector)
        # relocalization queries the whole DB — no recency exclusion
        match = sc.detect(state.sc_db, desc,
                          dist_threshold=l.sc_dist_thresh,
                          num_candidates=s.sc_candidates,
                          exclude_recent=0)

        def attempt(_):
            kf_idx = jnp.maximum(match.index, 0)
            kf_pose = state.store.poses[kf_idx]
            init = se3.pose6_compose(
                kf_pose, jnp.array([0.0, 0.0, 1.0, 0.0, 0.0, 0.0]) * match.yaw)
            submap = _submap_around(state.store, kf_idx, l.search_num,
                                    s.icp_submap_points,
                                    cfg.registration.mapping_surf_leaf_size)
            r = reg.register(scan_ds.xyz, scan_ds.mask, submap.xyz, submap.mask,
                             init, cfg.registration)
            # acceptance = fitness + inlier FRACTION (a false basin can have
            # low point-to-plane residual on few inliers; demanding that most
            # of the scan found planar support rejects it).  The strict
            # 0.05deg/0.05cm `converged` flag may stay false on a good
            # alignment that simply used all iterations — fitness decides.
            n_scan = jnp.maximum(jnp.sum(scan_ds.mask.astype(jnp.int32)), 1)
            frac = r.num_inliers.astype(jnp.float32) / n_scan.astype(jnp.float32)
            ok = (r.mean_residual < l.fitness_score) & (frac > 0.3)
            return RelocResult(success=ok, pose=r.pose, matched_kf=match.index,
                               sc_distance=match.distance,
                               fitness=r.mean_residual)

        def fail(_):
            return RelocResult(success=jnp.zeros((), bool), pose=jnp.zeros(6),
                               matched_kf=jnp.full((), -1, jnp.int32),
                               sc_distance=match.distance,
                               fitness=jnp.zeros(()))

        return jax.lax.cond(match.index >= 0, attempt, fail, None)

    return relocalize
