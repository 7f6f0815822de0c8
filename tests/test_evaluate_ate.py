"""tools/evaluate_ate.py — TUM-benchmark-compatible ATE/RPE evaluator.

The reference's validation story is dataset runs + offline trajectory
evaluation with the TUM scripts (SURVEY.md §4); these tests gate the
shipped evaluator on a COMMITTED golden pair (deterministic synthetic
run) so real-dataset validation is a one-liner the day assets appear:

    python tools/evaluate_ate.py groundtruth.txt KeyFrameTrajectory.txt --scale
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import evaluate_ate as ev  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
GT = os.path.join(GOLDEN, "groundtruth_tum.txt")
EST = os.path.join(GOLDEN, "CameraTrajectory.txt")
KF_EST = os.path.join(GOLDEN, "KeyFrameTrajectory.txt")


def test_golden_ate_within_gate(capsys):
    rc = ev.main([GT, EST, "--scale", "--max_ate", "0.03"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "gate PASS" in out
    rmse = float([ln for ln in out.splitlines()
                  if ln.startswith("absolute_translational_error.rmse")][0]
                 .split()[1])
    # Matches the driver's own Sim3-aligned report (~0.9 cm) — a committed
    # regression bound on tracking quality.
    assert rmse < 0.02


def test_keyframe_trajectory_evaluates(capsys):
    rc = ev.main([GT, KF_EST, "--scale", "--max_difference", "0.03"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "absolute_translational_error.rmse" in out


def test_gate_fails_loudly(capsys):
    rc = ev.main([GT, EST, "--scale", "--max_ate", "1e-6"])
    assert rc == 1
    assert "gate FAIL" in capsys.readouterr().out


def test_kitti_format_roundtrip(tmp_path):
    """KITTI 3x4 rows are auto-detected and associated by line index."""
    rng = np.random.default_rng(3)
    rows_gt, rows_est = [], []
    for i in range(10):
        th = 0.1 * i
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        t = np.array([i * 0.5, 0.1 * i, 0.0])
        T = np.hstack([R, t[:, None]])
        rows_gt.append(" ".join(f"{v:.9e}" for v in T.ravel()))
        t2 = t + rng.normal(0, 0.01, 3)
        T2 = np.hstack([R, t2[:, None]])
        rows_est.append(" ".join(f"{v:.9e}" for v in T2.ravel()))
    p_gt = tmp_path / "gt.txt"
    p_est = tmp_path / "est.txt"
    p_gt.write_text("\n".join(rows_gt) + "\n")
    p_est.write_text("\n".join(rows_est) + "\n")
    gt = ev.load_trajectory(str(p_gt))
    est = ev.load_trajectory(str(p_est))
    pairs = ev.associate(gt, est, 0.0, 0.02)
    assert len(pairs) == 10
    stats = ev.ate(gt, est, pairs, with_scale=False)
    assert stats["absolute_translational_error.rmse"] < 0.05
    rp = ev.rpe(gt, est, pairs, delta=1)
    assert rp["rotational_error.rmse_deg"] < 0.01  # rotations are exact


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    P = rng.normal(size=(50, 3))
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    Q = 2.5 * (R @ P.T).T + np.array([1.0, -2.0, 0.5])
    s, R2, t2 = ev.umeyama(P, Q, with_scale=True)
    assert abs(s - 2.5) < 1e-9
    assert np.allclose(R2, R)
    err = (s * (R2 @ P.T).T + t2) - Q
    assert np.abs(err).max() < 1e-9


def test_association_offset():
    gt = {float(i): np.eye(4) for i in range(10)}
    est = {float(i) + 0.5: np.eye(4) for i in range(10)}
    assert not ev.associate(gt, est, 0.0, 0.02)
    assert len(ev.associate(gt, est, -0.5, 0.02)) == 10
