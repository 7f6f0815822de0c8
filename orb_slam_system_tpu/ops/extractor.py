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


def _blur_patches(patches: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode separable 7x7 sigma=2 Gaussian over [B,N,P,P] patches
    (the reference blurs whole pyramid levels before computing descriptors,
    src/ORBextractor.cc:472-494; blurring only the gathered patches is
    equivalent inside the valid region and far cheaper)."""
    k = jnp.asarray(pyr_ops.gaussian_kernel_1d(7, 2.0))
    x = patches
    out = None
    for i in range(7):
        sl = jax.lax.slice_in_dim(x, i, i + x.shape[2] - 6, axis=2)
        out = sl * k[i] if out is None else out + sl * k[i]
    x = out
    out = None
    for i in range(7):
        sl = jax.lax.slice_in_dim(x, i, i + x.shape[3] - 6, axis=3)
        out = sl * k[i] if out is None else out + sl * k[i]
    return out


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
        from orb_slam_system_tpu.ops import fast_pallas, gather_pallas
        if fast_pallas.use_pallas():
            # Pallas path fuses 3x3 NMS into the score kernel.
            self._score_fn = lambda lvl, border: fast_pallas.fast_score_map_pallas(
                lvl, border, nms=True)
            self._pre_nms = True
        else:
            self._score_fn = lambda lvl, border: fast_ops.fast_score_map(
                lvl, border=border)
            self._pre_nms = False
        if gather_pallas.use_pallas():
            self._gather_fn = gather_pallas.gather_patches_pallas
        else:
            self._gather_fn = gather_patches
        self._fn = jax.jit(self._extract)

    def __call__(self, img: jnp.ndarray) -> FeatureSet:
        """img: f32[B, H, W] grayscale in [0, 255]."""
        return self._fn(img)

    def _extract(self, img: jnp.ndarray) -> FeatureSet:
        cfg = self.cfg
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        xs, resps, valids, octs, patch_blocks = [], [], [], [], []
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
                pre_nms=self._pre_nms,
            )
            # ONE patch gather per level: a 43x43 patch (radius 21 =
            # descriptor radius 18 + blur halo 3) from the reflect-padded
            # unblurred level serves both the IC-angle moments (center
            # 31x31) and, after an in-patch separable 7x7 blur, the rBRIEF
            # sampling window — replacing two gathers + an image-wide blur
            # (gathers are the TPU bottleneck; the per-patch blur is ~50M
            # MACs per batch).
            R_G = PATCH_RADIUS + 3
            padded = jnp.pad(lvl, ((0, 0), (3, 3), (3, 3)), mode="reflect")
            patch_blocks.append(self._gather_fn(padded, xy_l + 3, R_G))
            xs.append(xy_l.astype(jnp.float32) * self.scales[l])
            resps.append(resp)
            valids.append(valid)
            octs.append(jnp.full(resp.shape, l, jnp.int32))
        # Post-gather compute (IC angle, in-patch blur, rBRIEF matmul) runs
        # ONCE over ALL levels' patches concatenated: 8 small per-level
        # programs starve the MXU (the [A,P*P,256] descriptor contraction
        # wants a large batch); one fused block keeps it fed.
        patches_g = jnp.concatenate(patch_blocks, axis=1)  # [B, N_all, P, P]
        c0 = (PATCH_RADIUS + 3) - HALF_PATCH
        patches_o = patches_g[:, :, c0:c0 + 2 * HALF_PATCH + 1,
                              c0:c0 + 2 * HALF_PATCH + 1]
        ang = ic_angles(patches_o)
        patches_d = _blur_patches(patches_g)
        desc = compute_descriptors(patches_d, ang)
        return FeatureSet(
            xy=jnp.concatenate(xs, axis=1),
            response=jnp.concatenate(resps, axis=1),
            angle=ang,
            octave=jnp.concatenate(octs, axis=1),
            desc=desc,
            valid=jnp.concatenate(valids, axis=1),
        )
