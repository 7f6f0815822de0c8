"""Pallas TPU kernel for the binned rBRIEF contraction.

Consumes the bin-sorted, single-bin-chunk patch layout built by
ops/brief.compute_descriptors and contracts each [CHUNK, P*P] chunk with
ONLY its own angle bin's [P*P, 256] +/-1 test matrix. The bin id per chunk
is scalar-prefetched and drives the E-block index map, so Mosaic fetches a
test matrix from HBM once per RUN of same-bin chunks (the layout is sorted
by bin, so ~32 fetches total) instead of computing all 32 bins for every
keypoint as the dense einsum did.

TPU-only; caller gates via use_pallas().
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam_system_tpu.ops import brief as _brief

PP = (2 * _brief.PATCH_RADIUS + 1) ** 2      # 1369
PP_PAD = -(-PP // 128) * 128                 # 1408: lane-aligned contraction


@functools.lru_cache(maxsize=1)
def _e_padded() -> np.ndarray:
    """[A, PP_PAD, 256] bf16 test matrices, zero rows in the lane padding."""
    e = np.zeros((_brief.N_ANGLE_BINS, PP_PAD, _brief.N_BITS),
                 dtype=_brief._E_BINNED.dtype)
    e[:, :PP] = _brief._E_BINNED
    return e


def _kernel(cb_ref, p_ref, e_ref, o_ref):
    del cb_ref
    o_ref[...] = jax.lax.dot_general(
        p_ref[...], e_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def binned_diffs_pallas(p_sorted: jnp.ndarray,
                        chunk_bin: jnp.ndarray) -> jnp.ndarray:
    """p_sorted: bf16[K*CHUNK, PP or PP_PAD] bin-sorted padded patches
    (callers pre-pad the row width to PP_PAD so the bin-sort gather moves
    lane-aligned rows); chunk_bin: i32[K]. Returns f32[K*CHUNK, 256]."""
    S, pp = p_sorted.shape
    assert pp in (PP, PP_PAD) and S % _brief.CHUNK == 0
    K = S // _brief.CHUNK
    p = (p_sorted if pp == PP_PAD
         else jnp.pad(p_sorted, ((0, 0), (0, PP_PAD - PP))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((_brief.CHUNK, PP_PAD), lambda k, cb: (k, 0)),
            pl.BlockSpec((1, PP_PAD, _brief.N_BITS),
                         lambda k, cb: (cb[k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((_brief.CHUNK, _brief.N_BITS),
                               lambda k, cb: (k, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, _brief.N_BITS), jnp.float32),
    )(chunk_bin, p, jnp.asarray(_e_padded()))
    return out


_DISABLED = False


def use_pallas() -> bool:
    import os
    if _DISABLED or os.environ.get("ORB_SLAM_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"
