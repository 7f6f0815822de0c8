"""Loop correction machinery on a constructed drifted map.

Builds two keyframe groups observing the SAME world structure — the second
group drifted by a known Sim3 — then drives LoopCloser.compute_sim3 +
correct_loop directly (bypassing BoW detection, which needs real imagery)
and checks the drift is removed.
"""

import numpy as np
import pytest

from orb_slam_system_tpu.config import CameraConfig, ORBConfig, Sensor, SlamConfig
from orb_slam_system_tpu.mapping.arena import FrameFeatures, MapArena
from orb_slam_system_tpu.models.loop_closing import LoopCloser
from orb_slam_system_tpu.models.local_mapping import LocalMapper
from orb_slam_system_tpu.models.place_recognition import PlaceRecognition

FX = FY = 300.0
CX, CY = 160.0, 120.0
N_SLOTS = 256


def make_cfg():
    cam = CameraConfig(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240)
    return SlamConfig(camera=cam, orb=ORBConfig(n_features=N_SLOTS),
                      sensor=Sensor.MONOCULAR)


def project(X, Tcw):
    Xc = X @ Tcw[:3, :3].T + Tcw[:3, 3]
    uv = Xc[:, :2] / Xc[:, 2:3] * [FX, FY] + [CX, CY]
    return uv.astype(np.float32), Xc[:, 2]


def make_feats(uv, desc, n_slots=N_SLOTS):
    n = len(uv)
    xy = np.zeros((n_slots, 2), np.float32)
    xy[:n] = uv
    valid = np.zeros(n_slots, bool)
    valid[:n] = True
    d = np.zeros((n_slots, 8), np.uint32)
    d[:n] = desc
    return FrameFeatures(
        xy=xy, xy_und=xy.copy(), response=np.ones(n_slots, np.float32),
        angle=np.zeros(n_slots, np.float32),
        octave=np.zeros(n_slots, np.int32), desc=d, valid=valid)


@pytest.fixture
def drifted_map(rng):
    """Chain of keyframes 0..9 along x; KFs 8,9 revisit the pose of KFs 0,1
    but are DRIFTED; their map points are duplicates of the originals
    (triangulated from drifted poses)."""
    arena = MapArena()
    cfg = make_cfg()
    world = rng.uniform(-2, 2, size=(120, 3)).astype(np.float32)
    world[:, 2] = rng.uniform(4, 7, size=120)
    descs = rng.integers(0, 2 ** 32, size=(120, 8), dtype=np.uint32)

    def pose_at(x_off):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -x_off  # camera at world x = x_off
        return T

    # Drift: the revisit segment is offset by 30 cm + slight yaw.
    drift = np.eye(4, dtype=np.float32)
    drift[0, 3] = 0.3
    drift[1, 3] = 0.12
    kfs = []
    mp_of_kf = {}
    for k in range(10):
        revisit = k >= 8
        # Revisit poses sit BETWEEN the originals (nonzero baseline to the
        # loop keyframe — with zero baseline, monocular Sim3 scale is an
        # unobservable gauge direction).
        x_off = (k - 8) * 0.4 + 0.2 if revisit else k * 0.4
        T_true = pose_at(x_off)
        T = (drift @ T_true) if revisit else T_true
        uv, z = project(world, T_true)  # observations from TRUE geometry
        vis = (z > 0.5) & (uv[:, 0] > 5) & (uv[:, 0] < 315) & \
              (uv[:, 1] > 5) & (uv[:, 1] < 235)
        idx = np.nonzero(vis)[0][:100]
        feats = make_feats(uv[idx], descs[idx])
        kf = arena.new_keyframe(k, k / 30.0, T, feats)
        kfs.append(kf)
        mp_of_kf[k] = idx
        # Map points: first segment creates originals; revisit segment
        # creates DRIFTED duplicates (as real drifted triangulation would).
        for slot, wi in enumerate(idx):
            if not revisit:
                if k == 0 or arena_has_point(arena, kfs, wi, k) is None:
                    pos = world[wi]
                    mp = arena.new_point(pos, descs[wi], kf.id, kf.id)
                    arena.add_observation(mp, kf, slot)
                else:
                    mp = arena_has_point(arena, kfs, wi, k)
                    arena.add_observation(mp, kf, slot)
            else:
                # Drifted copy: transform true point by drift^-1 relative
                # mapping (point as seen by drifted camera at true pixels).
                Tinv = np.linalg.inv(T)
                Xc = world[wi] @ pose_at(x_off)[:3, :3].T + pose_at(x_off)[:3, 3]
                pos = (Tinv[:3, :3] @ Xc + Tinv[:3, 3])
                mp = arena.new_point(pos.astype(np.float32), descs[wi],
                                     kf.id, kf.id)
                arena.add_observation(mp, kf, slot)
        arena.update_connections(kf)
        if kf.parent < 0 and k > 0:
            kf.parent = kfs[k - 1].id
            kfs[k - 1].children.add(kf.id)
        mp_ids = kf.mp_ids
        for slot in range(len(idx)):
            assert mp_ids[slot] >= 0
    # Normals/dists for all points.
    for mp in list(arena.mps.values()):
        arena.update_normal_and_depth(mp, np.asarray(cfg.orb.level_scales()))
    return arena, cfg, kfs, world, drift


def arena_has_point(arena, kfs, world_idx, upto_k):
    # Originals are indexed by creation order; reuse via observation search.
    for kf in kfs[:upto_k]:
        for slot, mid in enumerate(kf.mp_ids):
            if mid >= 0:
                mp = arena.mps.get(int(mid))
                if mp is not None and mp.first_kf_id == kf.id:
                    pass
    # Simpler: the fixture only calls this to dedupe consecutive frames;
    # return None to create one point per (kf, world point) except matching
    # is done by descriptor in compute_sim3 anyway.
    return None


def test_compute_sim3_and_correct_loop(drifted_map):
    arena, cfg, kfs, world, drift = drifted_map
    pr = PlaceRecognition(None, allow_self_train=False)
    lm = LocalMapper(cfg, arena)
    lc = LoopCloser(cfg, arena, pr, lm)
    cur = kfs[8]          # drifted revisit near KF 0's view
    cand = kfs[0]
    # Pose error before.
    true_pose = np.eye(4, dtype=np.float32)
    true_pose[0, 3] = -0.2
    err_before = np.abs(cur.Tcw - true_pose).max()
    assert err_before > 0.1  # drift present
    ok, matched_kf, Scw, loop_points, cur_matches = lc.compute_sim3(
        cur, [cand.id])
    assert ok
    assert matched_kf.id == cand.id
    assert abs(Scw["s"] - 1.0) < 0.05  # SE3-consistent drift -> scale ~1
    # Scw should map world to the TRUE camera frame of the revisit pose.
    lc.correct_loop(cur, matched_kf, Scw, loop_points, cur_matches)
    err_after = np.abs(cur.Tcw - true_pose).max()
    assert err_after < 0.3 * err_before
    # Loop edge recorded (upstream behavior the fork dropped).
    assert matched_kf.id in cur.loop_edges
    assert cur.id in matched_kf.loop_edges
    assert lc.last_loop_kf_id == cur.id
