"""ORB feature extraction pipeline: pyramid -> FAST -> orientation -> rBRIEF.

Replaces reference ORBextractor::operator() (src/ORBextractor.cc:442-495) as a
single jitted device program over batched frames. All shapes are static:
per-level keypoint budgets come from the config (geometric split, matching
src/ORBextractor.cc:141-151), each padded slot carries a validity bit.

Output keypoint coordinates are in level-0 pixels (the reference multiplies
kp.pt by the level scale at the end of operator(), :486-494); `octave` and
per-octave sigma2 follow the reference's scale pyramid semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.config import ORBConfig
from orb_slam_system_tpu.ops import fast as fast_ops
from orb_slam_system_tpu.ops import pyramid as pyr_ops
from orb_slam_system_tpu.ops.brief import PATCH_RADIUS, compute_descriptors
from orb_slam_system_tpu.ops.orientation import HALF_PATCH, ic_angles
from orb_slam_system_tpu.ops.patches import gather_patches

EDGE_MARGIN = 19  # reference EDGE_THRESHOLD (src/ORBextractor.cc:18)


class FeatureSet(NamedTuple):
    """Batched, padded keypoint set (level-0 coordinates)."""

    xy: jnp.ndarray        # f32[B, N, 2] (x, y) in level-0 pixels
    response: jnp.ndarray  # f32[B, N]
    angle: jnp.ndarray     # f32[B, N] radians in [0, 2pi)
    octave: jnp.ndarray    # i32[B, N]
    desc: jnp.ndarray      # u32[B, N, 8]
    valid: jnp.ndarray     # bool[B, N]

    @property
    def n_slots(self) -> int:
        return self.xy.shape[1]


class ORBExtractor:
    """Config-bound, shape-specialized ORB extractor.

    One instance per (image size, feature budget); the jitted program is
    cached after first trace. Mirrors the reference's use of separate
    ORBextractor instances for tracking vs. monocular init (2x features,
    src/Tracking.cc:76-82).
    """

    def __init__(self, cfg: ORBConfig, height: int, width: int,
                 pad_total: int | None = None, cell: int = 16):
        self.cfg = cfg
        self.height = height
        self.width = width
        budgets = cfg.per_level_features()
        total = sum(budgets)
        if pad_total is None:
            pad_total = ((total + 127) // 128) * 128
        budgets[0] += pad_total - total  # pad slack goes to level 0
        self.budgets = budgets
        self.n_slots = pad_total
        self.scales = np.asarray(cfg.level_scales(), dtype=np.float32)
        self.sigma2 = (self.scales ** 2).astype(np.float32)
        self.inv_sigma2 = (1.0 / self.sigma2).astype(np.float32)
        self.cell = cell
        # FAST score: fused Pallas kernel on TPU, XLA formulation elsewhere
        # (identical contract; see ops/fast_pallas.py).
        from orb_slam_system_tpu.ops import fast_pallas
        if fast_pallas.use_pallas():
            self._score_fn = lambda lvl, border: fast_pallas.fast_score_map_pallas(
                lvl, border)
        else:
            self._score_fn = lambda lvl, border: fast_ops.fast_score_map(
                lvl, border=border)
        self._fn = jax.jit(self._extract)

    def __call__(self, img: jnp.ndarray) -> FeatureSet:
        """img: f32[B, H, W] grayscale in [0, 255]."""
        return self._fn(img)

    def _extract(self, img: jnp.ndarray) -> FeatureSet:
        cfg = self.cfg
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        outs = []
        for l, lvl in enumerate(levels):
            n_l = self.budgets[l]
            if n_l <= 0:
                continue
            score = self._score_fn(lvl, EDGE_MARGIN)
            xy_l, resp, valid = fast_ops.select_keypoints(
                score,
                n_max=n_l,
                ini_th=float(cfg.ini_th_fast),
                min_th=float(cfg.min_th_fast),
                cell=self.cell,
                border=EDGE_MARGIN,
            )
            patches_o = gather_patches(lvl, xy_l, HALF_PATCH)
            ang = ic_angles(patches_o)
            blurred = pyr_ops.gaussian_blur(lvl)
            patches_d = gather_patches(blurred, xy_l, PATCH_RADIUS)
            desc = compute_descriptors(patches_d, ang)
            scale = self.scales[l]
            outs.append(
                FeatureSet(
                    xy=xy_l.astype(jnp.float32) * scale,
                    response=resp,
                    angle=ang,
                    octave=jnp.full(resp.shape, l, jnp.int32),
                    desc=desc,
                    valid=valid,
                )
            )
        return FeatureSet(
            xy=jnp.concatenate([o.xy for o in outs], axis=1),
            response=jnp.concatenate([o.response for o in outs], axis=1),
            angle=jnp.concatenate([o.angle for o in outs], axis=1),
            octave=jnp.concatenate([o.octave for o in outs], axis=1),
            desc=jnp.concatenate([o.desc for o in outs], axis=1),
            valid=jnp.concatenate([o.valid for o in outs], axis=1),
        )
