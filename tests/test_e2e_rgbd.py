"""End-to-end RGB-D SLAM on synthetic frames with analytic depth."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.config import (  # noqa: E402
    CameraConfig, ORBConfig, Sensor, SlamConfig, TrackingState)
from orb_slam_system_tpu.dataio import trajectory as traj_io  # noqa: E402
from orb_slam_system_tpu.dataio.synthetic import (  # noqa: E402
    PlanarSceneRenderer, make_texture, orbit_trajectory)
from orb_slam_system_tpu.models.system import System  # noqa: E402


@pytest.fixture(scope="module")
def rgbd_run():
    W, H = 320, 240
    cam = CameraConfig(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, fps=30.0,
                       width=W, height=H, bf=260.0 * 0.08)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=500),
                     sensor=Sensor.RGBD, th_depth=40.0,
                     depth_map_factor=5000.0)
    r = PlanarSceneRenderer(cam.K, W, H, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(20, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.RGBD)
    gt = {}
    for i, Tcw in enumerate(poses):
        ts = i / 30.0
        img = r.render(Tcw)
        depth_raw = r.render_depth(Tcw) * 5000.0  # TUM-style 16-bit scaling
        slam.track_rgbd(img, depth_raw, ts)
        R = Tcw[:3, :3]
        gt[ts] = (-R.T @ Tcw[:3, 3]).astype(np.float64)
    slam.shutdown()
    return slam, gt, len(poses)


def test_rgbd_tracks_metric(rgbd_run):
    slam, gt, n = rgbd_run
    assert slam.get_tracking_state() == TrackingState.OK
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    assert sum(1 for _, _, l in est if not l) >= n - 2
    rmse = traj_io.ate_rmse(est, gt)
    assert rmse < 0.05
    # Metric scale: depth-seeded map means NO Sim3 scale ambiguity — compare
    # unaligned relative span.
    est_pos = [(-T[:3, :3].T @ T[:3, 3]) for _, T, l in est if not l]
    span_est = np.linalg.norm(est_pos[-1] - est_pos[0])
    ts_sorted = sorted(gt)
    span_gt = np.linalg.norm(gt[ts_sorted[-1]] - gt[ts_sorted[0]])
    assert abs(span_est - span_gt) / max(span_gt, 1e-9) < 0.1


def test_rgbd_depth_seeding(rgbd_run):
    slam, _, _ = rgbd_run
    # The initial keyframe seeded map points from depth.
    assert slam.arena.n_points() > 200
    # Depth channel present on keyframe features.
    kf0 = slam.arena.kfs[slam.arena.kf_origin_id]
    assert kf0.feats.depth is not None
    d = kf0.feats.depth[kf0.feats.valid]
    assert (d[d > 0] > 1.0).all() and (d[d > 0] < 10.0).all()  # meters


def test_localization_mode_vo_survives_map_loss():
    """Localization-mode VO (upstream mbVO, src/Tracking.cc:530-571): with
    mapping paused and the map association wiped from the last frame,
    tracking continues on temporary depth-backprojected VO points, and
    recovers map tracking (mbVO clears) via relocalization/local map."""
    W, H = 320, 240
    cam = CameraConfig(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, fps=30.0,
                       width=W, height=H, bf=260.0 * 0.08)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=500),
                     sensor=Sensor.RGBD, th_depth=40.0,
                     depth_map_factor=5000.0)
    r = PlanarSceneRenderer(cam.K, W, H, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(16, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.RGBD)
    for i in range(8):
        ts = i / 30.0
        slam.track_rgbd(r.render(poses[i]), r.render_depth(poses[i]) * 5000.0,
                        ts)
    assert slam.get_tracking_state() == TrackingState.OK
    slam.activate_localization_mode()
    tracker = slam.tracker

    # Simulate the map going out of view: strip all map associations from
    # the last frame so the motion model has only VO points to work with.
    tracker.last_frame.mp_ids[:] = -1
    ok_states = []
    vo_used = False
    for i in range(8, 16):
        ts = i / 30.0
        slam.track_rgbd(r.render(poses[i]), r.render_depth(poses[i]) * 5000.0,
                        ts)
        ok_states.append(tracker.state == TrackingState.OK)
        vo_used = vo_used or bool(tracker.current.vo_points)
    assert ok_states[0], "VO points must carry the first map-less frame"
    assert vo_used, "temporary VO points were never created"
    assert ok_states[-1], "tracking did not survive the map-less stretch"
    slam.shutdown()
