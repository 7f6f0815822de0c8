"""End-to-end monocular SLAM on a synthetic sequence with ground truth.

The framework-level analogue of the reference's dataset drivers
(SURVEY.md §4): runs the full System over rendered frames and gates on ATE
RMSE, keyframe/map growth, and trajectory-file formats.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.config import TrackingState  # noqa: E402
from orb_slam_system_tpu.dataio import trajectory as traj_io  # noqa: E402


@pytest.fixture(scope="module")
def slam_run(tmp_path_factory):
    from examples.mono_synthetic import run
    out = tmp_path_factory.mktemp("e2e")
    slam, rmse = run(n_frames=25, out_dir=str(out), verbose=False,
                     n_features=400)
    return slam, rmse, out


def test_tracks_and_maps(slam_run):
    slam, rmse, _ = slam_run
    assert slam.get_tracking_state() == TrackingState.OK
    assert slam.arena.n_keyframes() >= 3
    assert slam.arena.n_points() > 150


def test_ate_rmse(slam_run):
    _, rmse, _ = slam_run
    # Upstream-quality target: ~1cm-class ATE on easy sequences
    # (BASELINE.md); gate loosely at 3cm for the small synthetic arc.
    assert rmse < 0.03


def test_trajectory_files(slam_run):
    slam, _, out = slam_run
    kf_path = out / "KeyFrameTrajectory.txt"
    cam_path = out / "CameraTrajectory.txt"
    kitti_path = out / "CameraTrajectoryKITTI.txt"
    assert kf_path.exists() and cam_path.exists() and kitti_path.exists()
    # TUM format: 8 floats per line, monotonically increasing timestamps.
    rows = [list(map(float, ln.split())) for ln in cam_path.read_text().splitlines()]
    assert all(len(r) == 8 for r in rows)
    ts = [r[0] for r in rows]
    assert ts == sorted(ts)
    # Quaternions normalized.
    for r in rows:
        q = np.asarray(r[4:8])
        assert abs(np.linalg.norm(q) - 1.0) < 1e-3
    # KITTI format: 12 floats per line; rotation part orthonormal.
    krows = [list(map(float, ln.split())) for ln in kitti_path.read_text().splitlines()]
    assert all(len(r) == 12 for r in krows)
    M = np.asarray(krows[0]).reshape(3, 4)
    np.testing.assert_allclose(M[:3, :3] @ M[:3, :3].T, np.eye(3), atol=1e-5)


def test_covisibility_graph(slam_run):
    slam, _, _ = slam_run
    # Every non-origin keyframe has a spanning-tree parent and covis edges.
    for kf_id, kf in slam.arena.kfs.items():
        if kf_id == slam.arena.kf_origin_id:
            continue
        assert kf.parent >= 0
        assert len(kf.covis) >= 1


def test_map_point_integrity(slam_run):
    slam, _, _ = slam_run
    for mp in slam.arena.mps.values():
        assert not mp.bad
        assert len(mp.obs) >= 1
        for kf_id, idx in mp.obs.items():
            kf = slam.arena.kfs.get(kf_id)
            if kf is not None:
                assert kf.mp_ids[idx] == mp.id
        assert mp.max_dist >= mp.min_dist >= 0
