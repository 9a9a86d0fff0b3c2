import numpy as np
import pytest

from lio_slam_tpu import config as C


def test_presets_exist():
    for name in C.PRESETS:
        cfg = C.get_config(name)
        assert cfg.lidar.n_scan > 0


def test_unknown_preset():
    with pytest.raises(KeyError):
        C.get_config("bogus")


def test_config_from_dict_reference_names():
    cfg = C.config_from_dict({
        "N_SCAN": 64,
        "Horizon_SCAN": 1024,
        "mappingSurfLeafSize": 0.25,
        "useGPS": True,
        "imuGravity": 9.81,
        "extrinsicRot": [-1, 0, 0, 0, -1, 0, 0, 0, 1],
        "historyKeyframeFitnessScore": 0.5,
        "unknownParamIgnored": 42,
    })
    assert cfg.lidar.n_scan == 64
    assert cfg.lidar.horizon_scan == 1024
    assert cfg.registration.mapping_surf_leaf_size == 0.25
    assert cfg.gps.use_gps is True
    assert cfg.imu.gravity == 9.81
    assert cfg.imu.ext_rot == (-1, 0, 0, 0, -1, 0, 0, 0, 1)
    assert cfg.loop.fitness_score == 0.5


def test_config_from_yaml(tmp_path):
    y = tmp_path / "rig.yaml"
    y.write_text("""
liorf:
  N_SCAN: 32
  lidarMaxRange: 90.0
  loopClosureEnableFlag: false
""")
    cfg = C.config_from_yaml(str(y))
    assert cfg.lidar.n_scan == 32
    assert cfg.lidar.lidar_max_range == 90.0
    assert cfg.loop.enabled is False


def test_replace_chaining():
    cfg = C.get_config("default")
    cfg2 = cfg.replace(mapping_process_interval=0.15)
    assert cfg2.mapping_process_interval == 0.15
    assert cfg.mapping_process_interval == 0.0


def test_profiling_module():
    import time
    from lio_slam_tpu.utils import profiling as prof
    t = prof.StageTimer()
    with t.stage("x"):
        time.sleep(0.01)
    with t.stage("x"):
        time.sleep(0.01)
    d = t.as_dict()
    assert d["x"]["count"] == 2
    assert d["x"]["mean_ms"] >= 9.0
    rm = prof.RateMonitor(expected_hz=10.0, window=20)
    for i in range(20):
        rm.tick(i * 0.1)
    assert abs(rm.hz - 10.0) < 0.5
    assert rm.healthy
    rm2 = prof.RateMonitor(expected_hz=10.0, window=20)
    for i in range(20):
        rm2.tick(i * 0.5)          # 2 Hz, unhealthy
    assert not rm2.healthy
