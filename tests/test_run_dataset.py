"""tools/run_dataset.py — the one-command real-dataset validation glue
(docs/RUNBOOK.md), driven end-to-end on a synthetic TUM stand-in so the
day real assets (TUM dir + ORBvoc.txt) appear, only the paths change."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.models.viewer import write_pgm  # noqa: E402
from tools.make_full_vocab import generate as _generate_vocab  # noqa: E402


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w < 1e-9:
        return np.array([0.0, 0.0, 0.0, 1.0])
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([x, y, z, w])


def test_detect_layouts(tmp_path):
    from tools.run_dataset import detect
    tum = tmp_path / "tum"
    tum.mkdir()
    (tum / "rgb.txt").write_text("#\n")
    assert detect(str(tum), "auto")[0] == "tum_mono"
    (tum / "depth.txt").write_text("#\n")
    (tum / "associations.txt").write_text("")
    assert detect(str(tum), "auto")[0] == "tum_rgbd"
    kitti = tmp_path / "00"
    (kitti / "image_0").mkdir(parents=True)
    assert detect(str(kitti), "auto")[0] == "kitti_mono"
    (kitti / "image_1").mkdir()
    assert detect(str(kitti), "stereo")[0] == "kitti_stereo"
    euroc = tmp_path / "MH01"
    (euroc / "mav0").mkdir(parents=True)
    assert detect(str(euroc), "auto")[0] == "euroc_mono"
    with pytest.raises(SystemExit):
        detect(str(tmp_path), "auto")


@pytest.mark.slow
def test_run_dataset_end_to_end(tmp_path):
    """Synthetic TUM layout + groundtruth.txt + tiny real-format
    vocabulary -> run_dataset auto-detects, pre-validates the vocabulary,
    runs mono_tum, evaluates ATE and passes the --max-ate gate."""
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)

    seq = tmp_path / "seq"
    (seq / "rgb").mkdir(parents=True)
    K = np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]], np.float32)
    r = PlanarSceneRenderer(K, 320, 240, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(30, radius=0.35, depth=-2.0, tilt=0.3)
    rgb_lines = ["#", "#", "#"]
    gt_lines = ["# ground truth", "#", "#"]
    for i, T in enumerate(poses):
        ts = i / 30.0
        name = f"rgb/{ts:.6f}.pgm"
        write_pgm(str(seq / name), r.render(T))
        rgb_lines.append(f"{ts:.6f} {name}")
        Rwc = T[:3, :3].T
        C = -Rwc @ T[:3, 3]
        q = _rot_to_quat(Rwc)
        gt_lines.append(f"{ts:.6f} {C[0]:.6f} {C[1]:.6f} {C[2]:.6f} "
                        f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    (seq / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (seq / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    voc = tmp_path / "voc.txt"
    # Real text format, small but DISCRIMINATIVE (k=10 L=2 = 100 words):
    # a degenerate few-word vocabulary makes every keyframe pair look like
    # a loop candidate and the run drowns in Sim3 attempts.
    _generate_vocab(str(voc), k=10, L=2, verbose=False)
    settings = tmp_path / "cam.yaml"
    settings.write_text(
        "%YAML:1.0\nCamera.fx: 260.0\nCamera.fy: 260.0\nCamera.cx: 160.0\n"
        "Camera.cy: 120.0\nCamera.fps: 30.0\nCamera.RGB: 1\n"
        "Camera.width: 320\nCamera.height: 240\n"
        "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "run_dataset.py"),
         str(seq), "--voc", str(voc), "--settings", str(settings),
         "--max-ate", "0.10", "--out-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=2400, env=env)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "dataset kind: tum_mono" in out.stdout
    assert "pre-validating vocabulary" in out.stdout
    assert "ok: k=10 L=2" in out.stdout
    assert "absolute_translational_error.rmse" in out.stdout
    assert "gate PASS" in out.stdout
    assert (tmp_path / "KeyFrameTrajectory.txt").exists()
