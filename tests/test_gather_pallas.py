"""Pallas DMA patch-gather vs the XLA block gather (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from orb_slam_system_tpu.ops.gather_pallas import gather_patches_pallas
from orb_slam_system_tpu.ops.patches import gather_patches


@pytest.mark.slow
def test_pallas_gather_matches_xla_interpret(rng):
    B, H, W, N = 2, 96, 160, 16
    img = jnp.asarray(rng.uniform(0, 255, size=(B, H, W)).astype(np.float32))
    xy = jnp.asarray(np.stack(
        [rng.integers(22, W - 22, size=(B, N)),
         rng.integers(22, H - 22, size=(B, N))], axis=-1).astype(np.int32))
    ref = np.asarray(gather_patches(img, xy, 21))
    with pltpu.force_tpu_interpret_mode():
        pal = np.asarray(gather_patches_pallas(img, xy, 21))
    np.testing.assert_array_equal(pal, ref)


@pytest.mark.slow
def test_fused_gather_hbm_fallback_matches_interpret(rng, monkeypatch):
    """The non-resident (per-keypoint HBM window) path stays bit-identical
    when the canvas exceeds the VMEM budget."""
    from orb_slam_system_tpu.ops import gather_pallas as gp
    monkeypatch.setattr(gp, "VMEM_CANVAS_BUDGET", 0)
    B, H, W, N = 1, 96, 160, 8
    img = jnp.asarray(rng.uniform(0, 255, size=(B, H, W)).astype(np.float32))
    xy = jnp.asarray(np.stack(
        [rng.integers(22, W - 22, size=(B, N)),
         rng.integers(22, H - 22, size=(B, N))], axis=-1).astype(np.int32))
    ref = np.asarray(gather_patches(img, xy, 21))
    with pltpu.force_tpu_interpret_mode():
        blur, mom = gp.gather_blur_moments_pallas(img, xy, 21)
        blur = np.asarray(blur)
    from orb_slam_system_tpu.ops.extractor import _blur_patches
    want = np.asarray(_blur_patches(jnp.asarray(ref)))
    np.testing.assert_allclose(blur, want, rtol=0, atol=2e-4)


@pytest.mark.slow
def test_fused_gather_blur_moments_matches_xla_interpret(rng):
    from orb_slam_system_tpu.ops.extractor import _blur_patches
    from orb_slam_system_tpu.ops.gather_pallas import gather_blur_moments_pallas
    from orb_slam_system_tpu.ops.orientation import HALF_PATCH, moment_weights

    B, H, W, N = 2, 96, 160, 16
    img = jnp.asarray(rng.uniform(0, 255, size=(B, H, W)).astype(np.float32))
    xy = jnp.asarray(np.stack(
        [rng.integers(22, W - 22, size=(B, N)),
         rng.integers(22, H - 22, size=(B, N))], axis=-1).astype(np.int32))
    patches = gather_patches(img, xy, 21)
    want_blur = np.asarray(_blur_patches(patches))
    c0 = 21 - HALF_PATCH
    PO = 2 * HALF_PATCH + 1
    sub = np.asarray(patches)[:, :, c0:c0 + PO, c0:c0 + PO]
    wx, wy = moment_weights()
    want_mom = np.stack([(sub * wx).sum(axis=(2, 3)),
                         (sub * wy).sum(axis=(2, 3))], axis=-1)
    with pltpu.force_tpu_interpret_mode():
        blur, mom = gather_blur_moments_pallas(img, xy, 21)
    np.testing.assert_allclose(np.asarray(blur), want_blur, rtol=2e-6,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(mom), want_mom, rtol=2e-5,
                               atol=0.5)
