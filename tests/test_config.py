import numpy as np

from orb_slam_system_tpu.config import (
    ORBConfig,
    Sensor,
    SlamConfig,
    TrackingState,
    load_settings,
)


TUM1_YAML = """%YAML:1.0

# Camera Parameters.
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989

Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314

Camera.fps: 30.0
Camera.RGB: 1

ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7

Viewer.KeyFrameSize: 0.05
"""


def test_sensor_enum_values():
    # Reference include/System.h:32-36
    assert Sensor.MONOCULAR == 0
    assert Sensor.STEREO == 1
    assert Sensor.RGBD == 2


def test_tracking_state_values():
    # Reference include/Tracking.h:62-68
    assert TrackingState.SYSTEM_NOT_READY == -1
    assert TrackingState.NO_IMAGES_YET == 0
    assert TrackingState.NOT_INITIALIZED == 1
    assert TrackingState.OK == 2
    assert TrackingState.LOST == 3


def test_load_tum1_yaml(tmp_path):
    p = tmp_path / "TUM1.yaml"
    p.write_text(TUM1_YAML)
    cfg = load_settings(str(p))
    assert abs(cfg.camera.fx - 517.306408) < 1e-6
    assert abs(cfg.camera.k3 - 1.163314) < 1e-6
    assert cfg.orb.n_features == 1000
    assert cfg.orb.n_levels == 8
    assert cfg.orb.ini_th_fast == 20
    assert cfg.camera.fps == 30.0


def test_opencv_matrix_block(tmp_path):
    p = tmp_path / "stereo.yaml"
    p.write_text(
        """%YAML:1.0
Camera.fx: 435.2
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1.0]
"""
    )
    cfg = load_settings(str(p), Sensor.STEREO)
    assert cfg.rect_left is not None
    np.testing.assert_allclose(cfg.rect_left["K"][0, 0], 458.654)
    np.testing.assert_allclose(cfg.rect_right["K"][1, 1], 456.134)


def test_per_level_features_sum():
    orb = ORBConfig(n_features=1000, scale_factor=1.2, n_levels=8)
    counts = orb.per_level_features()
    assert len(counts) == 8
    assert sum(counts) == 1000
    # Geometric decay: level 0 largest.
    assert counts[0] > counts[1] > counts[-2]
