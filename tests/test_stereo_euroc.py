"""EuRoC stereo rectification + driver end-to-end (hermetic).

The shipped examples/settings/euroc_stereo.yaml carries the LEFT/RIGHT
{K,D,R,P} blocks the reference ships in Examples/Stereo/EuRoC.yaml
(consumed at stereo_euroc.cc:60-98); these tests validate our
initUndistortRectifyMap equivalent against OpenCV and drive the actual
stereo_euroc.py entry point over a synthetic EuRoC-layout directory.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SETTINGS = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "settings", "euroc_stereo.yaml")


def test_settings_ship_rectification_blocks():
    from orb_slam_system_tpu.config import Sensor, load_settings

    cfg = load_settings(SETTINGS, Sensor.STEREO)
    assert cfg.rect_left is not None and cfg.rect_right is not None
    for blk in (cfg.rect_left, cfg.rect_right):
        assert blk["K"].shape == (3, 3)
        assert blk["R"].shape == (3, 3)
        assert blk["P"].shape == (3, 4)
        assert blk["D"].size >= 4
    # P encodes the shared rectified intrinsics and the baseline.
    P_r = cfg.rect_right["P"]
    assert abs(-P_r[0, 3] - cfg.camera.bf) < 1e-6


def test_rectify_map_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    from examples.stereo_euroc import build_rectify_map
    from orb_slam_system_tpu.config import Sensor, load_settings

    cfg = load_settings(SETTINGS, Sensor.STEREO)
    W, H = cfg.camera.width, cfg.camera.height
    for blk in (cfg.rect_left, cfg.rect_right):
        mx, my = build_rectify_map(blk["K"], blk["D"], blk["R"], blk["P"],
                                   W, H)
        gx, gy = cv2.initUndistortRectifyMap(
            blk["K"], blk["D"], blk["R"], blk["P"], (W, H), cv2.CV_32FC1)
        np.testing.assert_allclose(mx, gx, atol=2e-2)
        np.testing.assert_allclose(my, gy, atol=2e-2)


def test_rectified_pair_is_row_aligned():
    """Distort a rendered stereo pair with the EuRoC lens model, rectify it
    with our maps, and check that matched features land on the same row."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp

    from examples.stereo_euroc import build_rectify_map, remap_bilinear
    from orb_slam_system_tpu.config import (
        CameraConfig, ORBConfig, Sensor, SlamConfig, load_settings)
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture)
    from orb_slam_system_tpu.models.frame import FrameBuilder
    from orb_slam_system_tpu.ops import matching

    cfg = load_settings(SETTINGS, Sensor.STEREO)
    W, H = cfg.camera.width, cfg.camera.height
    K_rect = np.asarray(cfg.camera.K, np.float64)
    baseline = cfg.camera.bf / cfg.camera.fx

    # Render the IDEAL rectified pair (pinhole K_rect, pure-x baseline).
    r = PlanarSceneRenderer(K_rect.astype(np.float32), W, H,
                            texture=make_texture(4096, 8, 3),
                            tex_scale=900.0)
    T_l = np.eye(4, dtype=np.float32); T_l[2, 3] = 2.0
    T_r = T_l.copy(); T_r[0, 3] -= baseline
    ideal_l, ideal_r = r.render(T_l), r.render(T_r)

    # Forward-distort each ideal image into the raw camera geometry with
    # OpenCV (sampling the ideal image at the rectified location of each
    # raw pixel is exactly the inverse of our rectification), then rectify
    # with OUR maps and compare feature rows.
    out_imgs = []
    for blk, ideal in ((cfg.rect_left, ideal_l), (cfg.rect_right, ideal_r)):
        # raw pixel -> rectified pixel grid.
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        pts = np.stack([u.ravel(), v.ravel()], 1)[:, None, :]
        rect_pts = cv2.undistortPoints(
            pts, blk["K"], blk["D"], R=blk["R"], P=blk["P"])[:, 0, :]
        gx = rect_pts[:, 0].reshape(H, W).astype(np.float32)
        gy = rect_pts[:, 1].reshape(H, W).astype(np.float32)
        raw = remap_bilinear(ideal, gx, gy)          # ideal -> raw geometry
        mx, my = build_rectify_map(blk["K"], blk["D"], blk["R"], blk["P"],
                                   W, H)
        out_imgs.append(remap_bilinear(raw, mx, my))  # raw -> rectified
    rect_l, rect_r = out_imgs

    # Feature rows must align between the rectified views.
    fcfg = SlamConfig(camera=cfg.camera, orb=ORBConfig(n_features=600),
                      sensor=Sensor.STEREO)
    fb = FrameBuilder(fcfg)
    f = fb.build_stereo(rect_l, rect_r, 0.0)
    matched = (f.feats.u_right is not None and
               int((f.feats.u_right >= 0).sum()) or 0)
    assert matched >= 50, f"only {matched} row-aligned stereo matches"
    # Metric sanity: median depth should be ~2m (plane at z=2).
    d = f.feats.depth[f.feats.depth > 0]
    assert abs(np.median(d) - 2.0) < 0.25


@pytest.mark.slow
def test_stereo_euroc_driver_end_to_end(tmp_path):
    """Run the real stereo_euroc.py entry point over a synthetic
    EuRoC-layout directory (cam0/data, cam1/data, timestamp file)."""
    from orb_slam_system_tpu.config import Sensor, load_settings
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from PIL import Image

    cfg = load_settings(SETTINGS, Sensor.STEREO)
    W, H = cfg.camera.width, cfg.camera.height
    baseline = cfg.camera.bf / cfg.camera.fx
    r = PlanarSceneRenderer(np.asarray(cfg.camera.K, np.float32), W, H,
                            texture=make_texture(4096, 8, 3),
                            tex_scale=900.0)
    (tmp_path / "cam0" / "data").mkdir(parents=True)
    (tmp_path / "cam1" / "data").mkdir(parents=True)
    poses = orbit_trajectory(10, radius=0.3, depth=-2.0, tilt=0.2)
    stamps = []
    for i, T_l in enumerate(poses):
        ns = 1403636579763555584 + i * 50_000_000
        stamps.append(str(ns))
        # Stereo rig: Tcw_right = T_rl @ Tcw_left with T_rl = [I | -b*ex]
        # (the right camera sits +b along the left camera's x axis).
        T_rl = np.eye(4, dtype=np.float32)
        T_rl[0, 3] = -baseline
        T_r = T_rl @ T_l
        Image.fromarray(r.render(T_l).astype(np.uint8)).save(
            str(tmp_path / "cam0" / "data" / f"{ns}.png"))
        Image.fromarray(r.render(T_r).astype(np.uint8)).save(
            str(tmp_path / "cam1" / "data" / f"{ns}.png"))
    # EuRoC timestamp file format used by the reference driver.
    ts_file = tmp_path / "stamps.txt"
    ts_file.write_text("\n".join(stamps) + "\n")
    # Identity rectification for the synthetic rig (already pinhole): ship
    # a settings copy whose LEFT/RIGHT blocks are identity at K_rect.
    K = np.asarray(cfg.camera.K)
    ident = (
        "%YAML:1.0\n"
        f"Camera.fx: {K[0,0]}\nCamera.fy: {K[1,1]}\n"
        f"Camera.cx: {K[0,2]}\nCamera.cy: {K[1,2]}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        f"Camera.width: {W}\nCamera.height: {H}\n"
        "Camera.fps: 20.0\n"
        f"Camera.bf: {cfg.camera.bf}\n"
        "ThDepth: 35.0\n"
        f"LEFT.height: {H}\nLEFT.width: {W}\n" +
        _mat("LEFT.D", np.zeros(5)) + _mat("LEFT.K", K) +
        _mat("LEFT.R", np.eye(3)) +
        _mat("LEFT.P", np.hstack([K, np.zeros((3, 1))])) +
        f"RIGHT.height: {H}\nRIGHT.width: {W}\n" +
        _mat("RIGHT.D", np.zeros(5)) + _mat("RIGHT.K", K) +
        _mat("RIGHT.R", np.eye(3)) +
        _mat("RIGHT.P", np.hstack(
            [K, np.asarray([[-cfg.camera.bf], [0], [0]])])) +
        "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n")
    settings = tmp_path / "euroc_synth.yaml"
    settings.write_text(ident)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "examples",
                      "stereo_euroc.py"),
         "none", str(settings), str(tmp_path / "cam0"),
         str(tmp_path / "cam1"), str(ts_file), "--no-realtime"],
        capture_output=True, text=True, timeout=900, cwd=str(tmp_path),
        env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "median tracking time" in out.stdout
    traj = tmp_path / "CameraTrajectory.txt"
    assert traj.exists()
    rows = traj.read_text().strip().splitlines()
    assert len(rows) == 10


def _mat(name, a):
    a = np.asarray(a, np.float64)
    rows, cols = (a.shape + (1,))[:2] if a.ndim == 2 else (1, a.size)
    return (f"{name}: !!opencv-matrix\n   rows: {rows}\n   cols: {cols}\n"
            f"   dt: d\n   data: [" +
            ", ".join(str(x) for x in a.ravel()) + "]\n")
