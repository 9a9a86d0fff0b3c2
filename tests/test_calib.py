"""tools/calib.py — the euler2rot / combineCalib script equivalents."""

import json

import numpy as np

from tools.calib import combine_calib, euler_to_rot, rot_to_euler, main


def test_euler_rot_roundtrip():
    rpy = np.array([0.3, -0.4, 1.2])
    R = euler_to_rot(rpy)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    np.testing.assert_allclose(rot_to_euler(R), rpy, atol=1e-12)


def test_matches_se3_convention():
    from lio_slam_tpu.utils import se3
    import jax.numpy as jnp
    rpy = np.array([0.1, 0.2, -0.5])
    np.testing.assert_allclose(euler_to_rot(rpy),
                               np.asarray(se3.rpy_to_matrix(jnp.asarray(rpy))),
                               atol=1e-6)


def test_combine_matches_compose():
    from lio_slam_tpu.utils import se3
    import jax.numpy as jnp
    xyz1, rpy1 = [1.0, 2.0, 3.0], [0.1, 0.2, 0.3]
    xyz2, rpy2 = [0.5, -1.0, 2.5], [0.5, -0.3, 0.7]
    xyz, rpy = combine_calib(xyz1, rpy1, xyz2, rpy2)
    # T2 * T1 == pose6_compose(pose2, pose1)
    p = np.asarray(se3.pose6_compose(
        jnp.asarray(np.concatenate([rpy2, xyz2]).astype(np.float32)),
        jnp.asarray(np.concatenate([rpy1, xyz1]).astype(np.float32))))
    np.testing.assert_allclose(np.concatenate([rpy, xyz]), p, atol=1e-5)


def test_cli(capsys):
    main(["euler2rot", "0.1", "0.2", "0.3"])
    out = json.loads(capsys.readouterr().out)
    assert len(out["rot"]) == 9
    main(["combine", "--xyz1", "1", "2", "3", "--rpy1", "0.1", "0.2", "0.3",
          "--xyz2", "0.5", "-1", "2.5", "--rpy2", "0.5", "-0.3", "0.7"])
    out = json.loads(capsys.readouterr().out)
    assert len(out["xyz"]) == 3 and len(out["rpy"]) == 3
