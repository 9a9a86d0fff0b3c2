"""lio_slam_tpu — a TPU-native LiDAR-inertial SLAM engine.

A ground-up re-design (JAX / XLA / Pallas / pjit) of the capabilities of the
reference system (JiLiBIT/LIO-SLAM, a ROS1/C++ LIO-SAM fork):

- scan deskew via IMU rotation integration
- scan-to-map point-to-plane registration (Gauss-Newton, degeneracy handling)
- keyframe pose graph with odometry / GPS / loop factors
- IMU preintegration with online bias estimation
- loop closure (radius search + Scan Context) with submap ICP
- GPS/ENU fusion with a positioning-health state machine
- map products: global map export, rolling local map, 2.5D height map

Design stance (vs the reference's 4-process ROS pipeline):
- one SPMD JAX program per scan step; fixed-shape masked tensors
- voxel-bucket / tiled-matmul correspondence search instead of kd-trees
- batched Gauss-Newton pose-graph solver instead of GTSAM iSAM2
- `lax.scan` IMU preintegration; error-state fusion for the IMU front-end
- keyframe / map state shardable over a `jax.sharding.Mesh`
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls default to bfloat16 accumulation, which is catastrophic for
# geometry (meter-scale coordinates need ~1e-6 relative precision: a 512-step
# rotation chain drifts ~20% and the GN normal equations go NaN).  SLAM math
# runs in float32 end-to-end; kernels that can safely use bf16 (none of the
# geometric ones) opt in explicitly via `precision=` at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the full mapping step is a large XLA program
# (~1-3 min first compile on the TPU tunnel); cache compiled executables on
# disk so replays, tests, and the bench driver skip recompilation.
import os as _os

_cache_dir = _os.environ.get("LIO_SLAM_TPU_CACHE",
                             _os.path.expanduser("~/.cache/lio_slam_tpu_xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from lio_slam_tpu import config as config  # noqa: F401
