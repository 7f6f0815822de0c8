"""Relocalization and loop-closing end-to-end behavior on synthetic data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.config import TrackingState  # noqa: E402


@pytest.fixture(scope="module")
def tracked_system():
    from examples.mono_synthetic import make_config
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from orb_slam_system_tpu.models.system import System

    cfg = make_config(n_features=400)
    tex = make_texture(size=2048, block=8, seed=7)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width, cfg.camera.height,
                            texture=tex, tex_scale=220.0)
    poses = orbit_trajectory(25, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.MONOCULAR)
    for i, Tcw in enumerate(poses):
        slam.track_monocular(r.render(Tcw), i / 30.0)
    return slam, r, poses


def test_vocab_self_trained(tracked_system):
    slam, _, _ = tracked_system
    assert slam.place_rec.ready
    assert slam.place_rec.vocab.n_words > 50
    # Keyframes carry BoW vectors and direct-index nodes.
    for kf in slam.arena.kfs.values():
        assert kf.bow is not None and len(kf.bow) > 0
        assert kf.node_ids is not None


def test_bow_scoring_discriminates(tracked_system):
    slam, r, poses = tracked_system
    from orb_slam_system_tpu.vocab.vocabulary import Vocabulary
    kfs = sorted(slam.arena.kfs)
    bow0 = slam.arena.kfs[kfs[0]].bow
    self_score = Vocabulary.score(bow0, bow0)
    far_score = Vocabulary.score(bow0, slam.arena.kfs[kfs[-1]].bow)
    assert self_score > far_score


def test_relocalization_recovers(tracked_system):
    slam, r, poses = tracked_system
    # Simulate tracking loss, then show a view near the map.
    slam.tracker.state = TrackingState.LOST
    slam.tracker.velocity = None
    mid_pose = poses[10]
    Tcw = slam.track_monocular(r.render(mid_pose), 99.0)
    assert slam.get_tracking_state() == TrackingState.OK
    assert Tcw is not None
    # Recovered pose close to ground truth (up to map scale/frame: compare
    # camera center against the tracked map's frame via the original KF
    # nearest in time).
    c_est = -Tcw[:3, :3].T @ Tcw[:3, 3]
    # The map's world frame equals the first-KF camera frame with unit median
    # depth scaling; compare against the pose estimated for the same view
    # during normal tracking.
    entries = slam.tracker.trajectory
    from orb_slam_system_tpu.dataio.trajectory import frame_poses
    fp = frame_poses(slam.arena, entries)
    ts = [e[0] for e in fp]
    idx = int(np.argmin(np.abs(np.asarray(ts) - 10 / 30.0)))
    T_ref = fp[idx][1]
    c_ref = -T_ref[:3, :3].T @ T_ref[:3, 3]
    assert np.linalg.norm(c_est - c_ref) < 0.08


def test_map_save_load_and_resume(tracked_system, tmp_path):
    """Checkpoint/resume: save the map, load it into a fresh System, and
    localize against it (the reference's TODO SaveMap/LoadMap implemented)."""
    slam, r, poses = tracked_system
    from examples.mono_synthetic import make_config
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.models.system import System

    path = str(tmp_path / "map.npz")
    slam.save_map(path)
    slam2 = System(None, make_config(n_features=400), Sensor.MONOCULAR)
    slam2.load_map(path, localization_only=True)
    assert slam2.arena.n_keyframes() == slam.arena.n_keyframes()
    assert slam2.arena.n_points() == slam.arena.n_points()
    # Observation cross-links intact.
    for mp in slam2.arena.mps.values():
        for kf_id, idx in mp.obs.items():
            if kf_id in slam2.arena.kfs:
                assert slam2.arena.kfs[kf_id].mp_ids[idx] == mp.id
    # Localize a known view against the loaded map.
    Tcw = slam2.track_monocular(r.render(poses[12]), 200.0)
    assert slam2.get_tracking_state() == TrackingState.OK
    assert Tcw is not None
    # Localization-only: no new keyframes were added.
    assert slam2.arena.n_keyframes() == slam.arena.n_keyframes()


def test_relocalization_rejects_unseen_view(tracked_system):
    slam, r, poses = tracked_system
    slam.tracker.state = TrackingState.LOST
    slam.tracker.velocity = None
    # A far-away view of a different part of the plane.
    T = poses[0].copy()
    T[:3, 3] += np.array([5.0, 5.0, 0.0])  # shift camera far off the map
    slam.track_monocular(r.render(T), 100.0)
    assert slam.get_tracking_state() == TrackingState.LOST


def test_relocalization_uncapped_candidate_rank(tracked_system, monkeypatch):
    """The reference tries EVERY BoW candidate's PnP in its loop
    (src/Tracking.cc:820-860); a capped candidate list would fail when the
    correct keyframe ranks low. The batched reloc runs ALL candidates in
    one device call — here the useful candidates are pushed past position
    5 behind six unusable decoys and relocalization must still succeed."""
    slam, r, poses = tracked_system
    db = slam.place_rec.db
    orig = db.detect_reloc_candidates

    calls = {}

    def reordered(bow, arena):
        cands = orig(bow, arena)
        if not cands:
            return cands
        out = [99991, 99992, 99993, 99994, 99995, 99996] + cands[::-1]
        calls["list"] = out
        return out

    monkeypatch.setattr(db, "detect_reloc_candidates", reordered)
    slam.tracker.state = TrackingState.LOST
    slam.tracker.velocity = None
    Tcw = slam.track_monocular(r.render(poses[10]), 300.0)
    assert calls, "reloc candidate search never ran"
    # Every live candidate really sat past the 5-entry prefix.
    assert all(c >= 99991 for c in calls["list"][:6])
    assert slam.get_tracking_state() == TrackingState.OK
    assert Tcw is not None
