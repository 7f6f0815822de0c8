"""Dataset reader formats + driver-level end-to-end (TUM directory layout)."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.dataio import datasets  # noqa: E402
from orb_slam_system_tpu.models.viewer import write_pgm  # noqa: E402


def test_pnm_roundtrip(tmp_path, rng):
    img = rng.uniform(0, 255, size=(24, 32)).astype(np.float32)
    p = tmp_path / "x.pgm"
    write_pgm(str(p), img)
    out = datasets.load_image_gray(str(p))
    np.testing.assert_allclose(out, np.clip(img, 0, 255).astype(np.uint8),
                               atol=0.5)


def test_tum_rgb_listing(tmp_path):
    seq = tmp_path / "seq"
    (seq / "rgb").mkdir(parents=True)
    lines = ["# color images", "# file: 'x.bag'", "# timestamp filename"]
    for i in range(3):
        lines.append(f"13050310{i}.44 rgb/13050310{i}.44.png")
    (seq / "rgb.txt").write_text("\n".join(lines) + "\n")
    paths, times = datasets.load_tum_rgb(str(seq))
    assert len(paths) == 3
    assert abs(times[0] - 130503100.44) < 1e-3
    assert paths[0].endswith("rgb/130503100.44.png")


def test_kitti_listing(tmp_path):
    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    (seq / "times.txt").write_text("0.0\n0.1\n0.2\n")
    left, right, times = datasets.load_kitti(str(seq), stereo=True)
    assert len(left) == 3 and len(right) == 3
    assert left[1].endswith("image_0/000001.png")
    assert times[2] == 0.2


def test_euroc_listing(tmp_path):
    cam = tmp_path / "cam0"
    (cam / "data").mkdir(parents=True)
    ts = tmp_path / "ts.txt"
    ts.write_text("1403636579763555584\n1403636579813555456\n")
    paths, times = datasets.load_euroc(str(cam), str(ts))
    assert len(paths) == 2
    assert paths[0].endswith("data/1403636579763555584.png")
    assert abs(times[0] - 1403636579.763555584) < 1e-4


def test_association_listing(tmp_path):
    seq = tmp_path / "seq"
    seq.mkdir()
    assoc = tmp_path / "assoc.txt"
    assoc.write_text(
        "1.0 rgb/1.0.png 1.01 depth/1.01.png\n"
        "2.0 rgb/2.0.png 2.01 depth/2.01.png\n")
    rgb, depth, times = datasets.load_tum_associations(str(seq), str(assoc))
    assert len(rgb) == 2
    assert rgb[0].endswith("rgb/1.0.png")
    assert depth[1].endswith("depth/2.01.png")


@pytest.mark.slow
def test_mono_tum_driver_end_to_end(tmp_path):
    """Render a synthetic sequence into a TUM-format directory (PGM frames +
    rgb.txt) and run the actual mono_tum driver binary-style."""
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)

    seq = tmp_path / "seq"
    (seq / "rgb").mkdir(parents=True)
    K = np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]], np.float32)
    r = PlanarSceneRenderer(K, 320, 240, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(18, radius=0.35, depth=-2.0, tilt=0.3)
    lines = ["# synthetic", "#", "#"]
    for i, T in enumerate(poses):
        ts = i / 30.0
        name = f"rgb/{ts:.6f}.pgm"
        write_pgm(str(seq / name), r.render(T))
        lines.append(f"{ts:.6f} {name}")
    (seq / "rgb.txt").write_text("\n".join(lines) + "\n")
    settings = tmp_path / "cam.yaml"
    settings.write_text(
        "%YAML:1.0\nCamera.fx: 260.0\nCamera.fy: 260.0\nCamera.cx: 160.0\n"
        "Camera.cy: 120.0\nCamera.fps: 30.0\nCamera.RGB: 1\n"
        "Camera.width: 320\nCamera.height: 240\n"
        "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    # Generous timeout: the run takes ~25 s warm-cache on this box, but a
    # cold XLA compile of the full tracking program set on the single CPU
    # core (or compile-cache contention with a concurrently-compiling
    # parent pytest process) has been seen to stretch far beyond 900 s.
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "examples", "mono_tum.py"),
         "none", str(settings), str(seq), "--no-realtime"],
        capture_output=True, text=True, timeout=2400, cwd=str(tmp_path),
        env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "median tracking time" in out.stdout
    traj = tmp_path / "KeyFrameTrajectory.txt"
    assert traj.exists()
    rows = traj.read_text().strip().splitlines()
    assert len(rows) >= 3
    assert all(len(r.split()) == 8 for r in rows)


def test_live_camera_driver_fake_capture():
    """The myslam equivalent (examples/live_camera.py, reference
    laptop_camera.cpp:6-20): drive System from a capture object. Uses a
    fake cv2-style capture feeding synthetic BGR frames (no camera device
    in this environment); covers the BGR->gray conversion, wall-clock
    timestamps, pipelined tracking, and bounded run length."""
    from examples import live_camera
    from orb_slam_system_tpu.config import (
        CameraConfig, ORBConfig, Sensor, SlamConfig, TrackingState)
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from orb_slam_system_tpu.models.system import System

    W, H = 320, 240
    cam = CameraConfig(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, fps=30.0,
                       width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=400),
                     sensor=Sensor.MONOCULAR)
    r = PlanarSceneRenderer(cam.K, W, H, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(16, radius=0.35, depth=-2.0, tilt=0.3)

    class FakeCapture:
        def __init__(self):
            self.i = 0
            self.released = False

        def read(self):
            if self.i >= len(poses):
                return False, None
            g = np.clip(r.render(poses[self.i]), 0, 255).astype(np.uint8)
            self.i += 1
            return True, np.stack([g, g, g], axis=-1)   # BGR

        def release(self):
            self.released = True

    cap = FakeCapture()
    slam = System(None, cfg, Sensor.MONOCULAR)
    n = live_camera.run(slam, cap, max_frames=14, report_every=0)
    state = slam.get_tracking_state()
    kfs = slam.arena.n_keyframes()
    slam.shutdown()
    cap.release()
    assert n == 14                       # bounded by max_frames
    assert cap.i == 14
    assert state == TrackingState.OK
    assert kfs >= 2
    assert cap.released
