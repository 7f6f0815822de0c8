"""Frame: per-image feature container + device-side construction pipeline.

Replaces reference Frame (src/Frame.cc): ORB extraction, keypoint
undistortion (:384-414), image-bound computation, and the per-frame tracking
bookkeeping (map-point ids, outlier flags). The reference's 64x48 feature
grid (include/Frame.h:17-18) has no equivalent here: candidate gating happens
inside the dense masked matchers (ops/matching.py), which is the TPU-native
replacement for grid bucketing.

Construction runs extraction + undistortion as jitted device programs and
then pulls ONE host copy of the padded arrays (a single device->host
transfer per frame).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.config import SlamConfig
from orb_slam_system_tpu.mapping.arena import FrameFeatures
from orb_slam_system_tpu.ops.extractor import ORBExtractor
from orb_slam_system_tpu.utils import camera as cam_ops


@dataclasses.dataclass
class Frame:
    id: int
    timestamp: float
    feats: FrameFeatures
    Tcw: Optional[np.ndarray] = None       # f32[4,4] world->camera
    mp_ids: Optional[np.ndarray] = None    # i64[N] map point per feature
    outlier: Optional[np.ndarray] = None   # bool[N]
    ref_kf_id: int = -1
    # Stereo / RGB-D channel (reference mvuRight / mvDepth, src/Frame.cc):
    u_right: Optional[np.ndarray] = None   # f32[N], -1 = mono feature
    depth: Optional[np.ndarray] = None     # f32[N], -1 = no depth
    # Temporary visual-odometry points (localization mode, upstream
    # UpdateLastFrame: depth-backprojected points NOT in the map):
    # {feature slot -> world position f32[3]}.
    vo_points: Optional[dict] = None

    def __post_init__(self):
        n = self.feats.n_slots
        if self.mp_ids is None:
            self.mp_ids = np.full(n, -1, np.int64)
        if self.outlier is None:
            self.outlier = np.zeros(n, bool)

    @property
    def n_valid(self) -> int:
        return int(self.feats.valid.sum())

    def camera_center(self) -> np.ndarray:
        R = self.Tcw[:3, :3]
        return -R.T @ self.Tcw[:3, 3]


class FrameBuilder:
    """Shape-specialized frame construction: extraction + undistortion."""

    def __init__(self, cfg: SlamConfig, n_features: Optional[int] = None):
        self.cfg = cfg
        cam = cfg.camera
        orb = cfg.orb
        if n_features is not None:
            orb = dataclasses.replace(orb, n_features=n_features)
        self.extractor = ORBExtractor(orb, cam.height, cam.width)
        self.scale_factors = self.extractor.scales
        self.inv_sigma2 = self.extractor.inv_sigma2
        self.sigma2 = self.extractor.sigma2
        self._next_id = 0
        k = cam
        self._undistort = jax.jit(
            lambda uv: cam_ops.undistort_points(
                uv, k.fx, k.fy, k.cx, k.cy, k.k1, k.k2, k.p1, k.p2, k.k3))
        # Undistorted image bounds (reference ComputeImageBounds).
        b = cam_ops.compute_image_bounds(
            cam.width, cam.height, k.fx, k.fy, k.cx, k.cy,
            k.k1, k.k2, k.p1, k.p2, k.k3)
        self.bounds = tuple(float(x) for x in b)  # (min_x, max_x, min_y, max_y)

    def build(self, img: np.ndarray, timestamp: float) -> Frame:
        """img: f32/u8 [H, W] grayscale."""
        x = jnp.asarray(img, jnp.float32)[None]
        fs = self.extractor(x)
        und = self._undistort(fs.xy)
        feats = FrameFeatures(
            xy=np.asarray(fs.xy[0]),
            xy_und=np.asarray(und[0]),
            response=np.asarray(fs.response[0]),
            angle=np.asarray(fs.angle[0]),
            octave=np.asarray(fs.octave[0]),
            desc=np.asarray(fs.desc[0]),
            valid=np.asarray(fs.valid[0]),
        )
        f = Frame(id=self._next_id, timestamp=timestamp, feats=feats)
        self._next_id = self._next_id + 1
        return f

    def build_stereo(self, img_left: np.ndarray, img_right: np.ndarray,
                     timestamp: float) -> Frame:
        """Rectified stereo frame: one batched extraction over both images
        (the TPU-native version of the reference's two extraction threads,
        src/Frame.cc:58-61) + row-banded stereo matching."""
        from orb_slam_system_tpu.ops.stereo import stereo_match

        cam = self.cfg.camera
        x = jnp.stack([jnp.asarray(img_left, jnp.float32),
                       jnp.asarray(img_right, jnp.float32)])
        fs = self.extractor(x)
        und = self._undistort(fs.xy)
        u_right, depth = stereo_match(
            x[0], x[1],
            fs.xy[0], fs.octave[0], fs.desc[0], fs.valid[0],
            fs.xy[1], fs.octave[1], fs.desc[1], fs.valid[1],
            jnp.asarray(self.scale_factors), cam.bf,
            0.0, cam.fx)
        feats = FrameFeatures(
            xy=np.asarray(fs.xy[0]),
            xy_und=np.asarray(und[0]),
            response=np.asarray(fs.response[0]),
            angle=np.asarray(fs.angle[0]),
            octave=np.asarray(fs.octave[0]),
            desc=np.asarray(fs.desc[0]),
            valid=np.asarray(fs.valid[0]),
            u_right=np.asarray(u_right),
            depth=np.asarray(depth),
        )
        f = Frame(id=self._next_id, timestamp=timestamp, feats=feats,
                  u_right=feats.u_right, depth=feats.depth)
        self._next_id += 1
        return f

    def build_rgbd(self, img: np.ndarray, depth_map: np.ndarray,
                   timestamp: float) -> Frame:
        """RGB-D frame: extraction + pseudo-stereo from the depth map
        (reference src/Frame.cc:99-151, :623-644)."""
        from orb_slam_system_tpu.ops.stereo import rgbd_pseudo_stereo

        cam = self.cfg.camera
        x = jnp.asarray(img, jnp.float32)[None]
        fs = self.extractor(x)
        und = self._undistort(fs.xy)
        # Reference src/Tracking.cc:90-96: scale raw depth by 1/DepthMapFactor.
        df = self.cfg.depth_map_factor
        depth_scale = 1.0 / df if abs(df) > 1e-5 else 1.0
        u_right, depth = rgbd_pseudo_stereo(
            jnp.asarray(depth_map, jnp.float32), fs.xy[0], und[0],
            fs.valid[0], cam.bf, depth_scale)
        feats = FrameFeatures(
            xy=np.asarray(fs.xy[0]),
            xy_und=np.asarray(und[0]),
            response=np.asarray(fs.response[0]),
            angle=np.asarray(fs.angle[0]),
            octave=np.asarray(fs.octave[0]),
            desc=np.asarray(fs.desc[0]),
            valid=np.asarray(fs.valid[0]),
            u_right=np.asarray(u_right),
            depth=np.asarray(depth),
        )
        f = Frame(id=self._next_id, timestamp=timestamp, feats=feats,
                  u_right=feats.u_right, depth=feats.depth)
        self._next_id += 1
        return f
