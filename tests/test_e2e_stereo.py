"""End-to-end stereo SLAM on synthetic rectified pairs."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.config import TrackingState  # noqa: E402
from orb_slam_system_tpu.dataio import trajectory as traj_io  # noqa: E402


@pytest.fixture(scope="module")
def stereo_run():
    from examples.stereo_synthetic import run
    slam, rmse, scale_est, scale_gt = run(n_frames=18, out_dir="/tmp",
                                          verbose=False, n_features=400)
    return slam, rmse, scale_est, scale_gt


def test_stereo_initializes_first_frame(stereo_run):
    slam, _, _, _ = stereo_run
    # Upstream StereoInitialization: map seeded from frame 0's depth.
    kf0 = slam.arena.kfs.get(slam.arena.kf_origin_id)
    assert kf0 is not None and kf0.frame_id == 0
    assert slam.get_tracking_state() == TrackingState.OK


def test_stereo_metric_scale(stereo_run):
    _, rmse, scale_est, scale_gt = stereo_run
    assert rmse < 0.12
    assert abs(scale_est - scale_gt) / max(scale_gt, 1e-9) < 0.15


def test_stereo_features_have_disparity(stereo_run):
    slam, _, _, _ = stereo_run
    kf0 = slam.arena.kfs[slam.arena.kf_origin_id]
    ur = kf0.feats.u_right
    assert ur is not None
    matched = ur >= 0
    assert matched.sum() > 150
    # Disparity positive and sane (u_r < u for rectified pairs).
    u = kf0.feats.xy_und[:, 0]
    disp = u[matched] - ur[matched]
    assert (disp > 0).all()
    assert disp.max() < slam.cfg.camera.fx


def test_localization_mode_and_getters(stereo_run):
    slam, _, _, _ = stereo_run
    pts = slam.get_tracked_map_points()
    assert len(pts) > 30
    kps = slam.get_tracked_keypoints_un()
    assert kps.shape[1] == 2 and len(kps) > 100
    slam.activate_localization_mode()
    assert slam.tracker.only_tracking
    slam.deactivate_localization_mode()
    assert not slam.tracker.only_tracking
