"""Headless viewer + AR overlay components."""

import numpy as np

from orb_slam_system_tpu.models.ar import (
    cube_vertices,
    draw_cube,
    fit_plane,
)
from orb_slam_system_tpu.models.viewer import (
    annotate_frame,
    export_map_ply,
    status_text,
)
from orb_slam_system_tpu.config import TrackingState


def test_fit_plane(rng):
    n_true = np.array([0.0, 0.0, 1.0])
    pts = rng.uniform(-2, 2, size=(200, 3)).astype(np.float32)
    pts[:, 2] = 3.0 + rng.normal(size=200) * 0.005   # plane z=3
    pts[180:] += rng.uniform(0.5, 2.0, size=(20, 3))  # outliers
    fit = fit_plane(pts)
    assert fit is not None
    n, d, mask = fit
    assert abs(abs(n @ n_true) - 1.0) < 0.02
    assert mask.sum() > 150


def test_draw_cube_renders_lines(rng):
    img = np.full((240, 320), 50.0, np.float32)
    K = np.array([[260.0, 0, 160], [0, 260, 120], [0, 0, 1]])
    Tcw = np.eye(4)
    out = draw_cube(img, Tcw, K, center=np.array([0.0, 0.0, 2.0]),
                    normal=np.array([0.0, 0.0, -1.0]), size=0.3)
    assert (out == 255).sum() > 100  # wireframe pixels present


def test_annotate_and_status(rng):
    img = rng.uniform(0, 255, size=(120, 160)).astype(np.float32)
    xy = rng.uniform(10, 100, size=(20, 2)).astype(np.float32)
    mask = np.ones(20, bool)
    out = annotate_frame(img, xy, mask)
    assert out.dtype == np.uint8
    assert (out == 255).sum() >= 20 * 4  # box borders drawn
    s = status_text(TrackingState.OK, 5, 100, 42)
    assert "OK" in s and "42" in s


def test_export_map_ply(tmp_path, rng):
    from orb_slam_system_tpu.mapping.arena import MapArena, FrameFeatures
    arena = MapArena()
    feats = FrameFeatures(
        xy=np.zeros((4, 2), np.float32), xy_und=np.zeros((4, 2), np.float32),
        response=np.zeros(4, np.float32), angle=np.zeros(4, np.float32),
        octave=np.zeros(4, np.int32), desc=np.zeros((4, 8), np.uint32),
        valid=np.ones(4, bool))
    kf1 = arena.new_keyframe(0, 0.0, np.eye(4, dtype=np.float32), feats)
    kf2 = arena.new_keyframe(1, 0.1, np.eye(4, dtype=np.float32), feats)
    kf2.covis[kf1.id] = 30
    for i in range(5):
        arena.new_point(rng.normal(size=3).astype(np.float32),
                        np.zeros(8, np.uint32), 0, 0)
    p = tmp_path / "map.ply"
    export_map_ply(str(p), arena)
    text = p.read_text()
    assert "element vertex 7" in text   # 5 points + 2 KF centers
    assert "element edge" in text
