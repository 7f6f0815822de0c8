"""Pallas FAST kernel vs the XLA reference formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from orb_slam_system_tpu.ops import fast as fast_ops
from orb_slam_system_tpu.ops import fast_pallas


@pytest.mark.slow
def test_pallas_fast_matches_xla_interpret(rng):
    # bf16-exact intensities so the kernel's bf16 math is lossless.
    img = (rng.uniform(0, 255, size=(1, 96, 128)) // 8 * 8).astype(np.float32)
    ref = np.asarray(jax.jit(
        lambda x: fast_ops.fast_score_map(x, border=19))(jnp.asarray(img)))
    with pltpu.force_tpu_interpret_mode():
        pal = np.asarray(fast_pallas.fast_score_map_pallas(jnp.asarray(img), 19))
    assert pal.shape == ref.shape
    # Same corner decisions at both thresholds and near-identical scores.
    np.testing.assert_allclose(pal, ref, atol=1.0)
    assert ((pal > 20) == (ref > 20)).mean() > 0.999
    assert ((pal > 7) == (ref > 7)).mean() > 0.999
