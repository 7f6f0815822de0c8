"""Tracking must survive a map-wide pose rewrite (loop correction / GBA).

Upstream propagates corrections into the motion model through
UpdateLastFrame's per-frame re-anchor — mLastFrame.SetPose(Tlr *
pRef->GetPose()), reference src/Tracking.cc:475-481 — so when CorrectLoop
or the GBA thread rewrites every keyframe pose, the very next frame's
prediction already lives in the corrected frame. Without that re-anchor
the tracker free-runs in the pre-correction frame: the KITTI-scale drive
lost tracking for 1300 frames when its async GBA landed (~4 min after the
lap-2 loop closure).

These tests apply a rigid world transform to the WHOLE map mid-sequence
(exactly what _apply_gba / correct_loop do, minus the optimization) and
assert tracking continues on the next frames — sequentially and in the
deep-pipelined chain mode (which must additionally discard in-flight
device results from the stale pose epoch).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.config import Sensor, TrackingState  # noqa: E402
from orb_slam_system_tpu.dataio.synthetic import (  # noqa: E402
    PlanarSceneRenderer, make_texture, orbit_trajectory)
from orb_slam_system_tpu.models.system import System  # noqa: E402


def _setup(n_frames):
    from examples.mono_synthetic import make_config

    cfg = make_config(n_features=400)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width,
                            cfg.camera.height,
                            texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(n_frames, radius=0.35, depth=-2.0, tilt=0.3)
    return cfg, r, poses


def _rigid_map_rewrite(arena, yaw=0.35, shift=(0.8, -0.5, 0.4)):
    """Move the whole map by a rigid world transform Tg (p' = Rg p + tg),
    keeping it self-consistent: Tcw' = Tcw @ Tg^-1. This is the shape of
    what _apply_gba and correct_loop+essential-graph do to the arena."""
    cz, sz = np.cos(yaw), np.sin(yaw)
    Rg = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]],
                  np.float32)
    tg = np.asarray(shift, np.float32)
    Tg_inv = np.eye(4, dtype=np.float32)
    Tg_inv[:3, :3] = Rg.T
    Tg_inv[:3, 3] = -Rg.T @ tg
    with arena.lock:
        for kf in arena.kfs.values():
            kf.Tcw = (kf.Tcw @ Tg_inv).astype(np.float32)
        for mp in arena.mps.values():
            arena.set_point_pos(mp, Rg @ mp.pos + tg)
            mp.normal = (Rg @ mp.normal).astype(np.float32)
        arena.pose_epoch += 1


def test_sequential_survives_global_pose_rewrite():
    n = 30
    cfg, r, poses = _setup(n)
    slam = System(None, cfg, Sensor.MONOCULAR)
    ok_after = 0
    rewrite_at = 20
    for i, T in enumerate(poses):
        if i == rewrite_at:
            assert slam.get_tracking_state() == TrackingState.OK
            _rigid_map_rewrite(slam.arena)
        slam.track_monocular(r.render(T), i / 30.0)
        if i >= rewrite_at and slam.get_tracking_state() == TrackingState.OK:
            ok_after += 1
    slam.shutdown()
    # Every post-rewrite frame keeps tracking (the re-anchor makes the
    # rewrite invisible to the motion model).
    assert ok_after == n - rewrite_at, ok_after
    # And the map really did move: poses live in the rewritten frame.
    assert slam.arena.pose_epoch == 1


def test_pipelined_survives_global_pose_rewrite():
    n = 44
    cfg, r, poses = _setup(n)
    slam = System(None, cfg, Sensor.MONOCULAR)
    rewrite_at = 28
    states = []

    def gen():
        for i, T in enumerate(poses):
            if i == rewrite_at:
                # Between enqueues, like an async GBA apply: in-flight
                # chain steps ran on the stale state and must be
                # discarded via the pose-epoch check.
                _rigid_map_rewrite(slam.arena)
            yield r.render(T), i / 30.0

    for _ in slam.track_monocular_pipelined(gen()):
        states.append(slam.get_tracking_state())
    slam.shutdown()
    assert len(states) == n
    post = states[rewrite_at:]
    n_ok = sum(1 for s in post if s == TrackingState.OK)
    # The frames in flight at the rewrite re-track classically; everything
    # after must keep tracking.
    assert n_ok >= len(post) - 1, (n_ok, [s.name for s in post])
    assert states[-1] == TrackingState.OK
