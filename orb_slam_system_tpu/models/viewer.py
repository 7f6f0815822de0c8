"""Headless visualization: frame annotation, map export, status text.

Replaces the reference's Pangolin/OpenCV viewer stack (Viewer src/Viewer.cc,
FrameDrawer src/FrameDrawer.cc, MapDrawer src/MapDrawer.cc) with headless
equivalents suitable for a TPU pod environment:
  * FrameDrawer -> annotate_frame: tracked/VO keypoint boxes burned into the
    grayscale image (numpy), plus the status text line (:49-66 overlay).
  * MapDrawer -> export_map_ply: map points + keyframe frusta + covisibility
    edges as a PLY point/edge cloud any 3D viewer opens.
  * Viewer::Run loop -> StatsViewer.update called per frame; writes
    snapshots on demand instead of a GL window.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def annotate_frame(img: np.ndarray, xy: np.ndarray, tracked_mask: np.ndarray,
                   box: int = 3) -> np.ndarray:
    """Draw white boxes around tracked keypoints (reference
    FrameDrawer::DrawFrame :16-90). img f32[H,W] -> u8[H,W]."""
    out = np.clip(img, 0, 255).astype(np.uint8).copy()
    H, W = out.shape
    for k in np.nonzero(tracked_mask)[0]:
        x, y = int(xy[k, 0]), int(xy[k, 1])
        x0, x1 = max(x - box, 0), min(x + box, W - 1)
        y0, y1 = max(y - box, 0), min(y + box, H - 1)
        out[y0, x0:x1 + 1] = 255
        out[y1, x0:x1 + 1] = 255
        out[y0:y1 + 1, x0] = 255
        out[y0:y1 + 1, x1] = 255
    return out


def status_text(state, n_kfs: int, n_mps: int, n_tracked: int) -> str:
    """Reference FrameDrawer status line (:49-66)."""
    return (f"SLAM MODE | state: {state.name} | KFs: {n_kfs} | "
            f"MPs: {n_mps} | Matches: {n_tracked}")


def export_map_ply(path: str, arena, draw_graph: bool = True):
    """Map points (white), keyframe centers (red) and covisibility edges as
    a PLY file (reference MapDrawer::DrawMapPoints/DrawKeyFrames/graph,
    src/MapDrawer.cc:21-198)."""
    with arena.lock:   # consistent snapshot vs the async mapping worker
        return _export_map_ply_locked(path, arena, draw_graph)


def _export_map_ply_locked(path: str, arena, draw_graph: bool = True):
    pts = []
    cols = []
    for mp in arena.mps.values():
        pts.append(mp.pos)
        cols.append((200, 200, 200))
    kf_ids = sorted(arena.kfs)
    kf_pos = {}
    for k in kf_ids:
        c = arena.kfs[k].camera_center()
        kf_pos[k] = len(pts)
        pts.append(c)
        cols.append((255, 50, 50))
    edges = []
    if draw_graph:
        for k in kf_ids:
            kf = arena.kfs[k]
            for nb in kf.covis:
                if nb > k and nb in kf_pos:
                    edges.append((kf_pos[k], kf_pos[nb]))
            if kf.parent >= 0 and kf.parent in kf_pos:
                edges.append((kf_pos[k], kf_pos[kf.parent]))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element edge {len(edges)}\n")
        f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for p, c in zip(pts, cols):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
        for a, b in edges:
            f.write(f"{a} {b}\n")


def write_pgm(path: str, img: np.ndarray):
    """Write a u8 grayscale image as binary PGM (no external codecs)."""
    img = np.clip(img, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
        f.write(img.tobytes())


class StatsViewer:
    """Per-frame status reporting + on-demand snapshots (the headless
    Viewer::Run equivalent)."""

    def __init__(self, system, out_dir: Optional[str] = None,
                 every_n: int = 0):
        self.system = system
        self.out_dir = out_dir
        self.every_n = every_n
        self.n = 0

    def update(self, img: Optional[np.ndarray] = None):
        sys_ = self.system
        cur = sys_.tracker.current
        line = status_text(sys_.get_tracking_state(),
                           sys_.arena.n_keyframes(), sys_.arena.n_points(),
                           len(sys_.get_tracked_map_points()))
        print(line, flush=True)
        if (self.out_dir and img is not None and self.every_n
                and self.n % self.every_n == 0 and cur is not None):
            tracked = (cur.mp_ids >= 0) & ~cur.outlier
            ann = annotate_frame(img, cur.feats.xy, tracked)
            write_pgm(os.path.join(self.out_dir, f"frame_{self.n:05d}.pgm"),
                      ann)
        self.n += 1

    def snapshot_map(self, path: str):
        export_map_ply(path, self.system.arena)
