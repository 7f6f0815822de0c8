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
