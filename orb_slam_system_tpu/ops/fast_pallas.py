"""Pallas TPU kernel for the dense FAST-9 corner score map.

The XLA formulation in ops/fast.py materializes [16, B, H, W] diff stacks in
HBM several times (~GBs of traffic per frame batch). This kernel processes
the image in VMEM row tiles: each grid step DMAs a (TILE_H + 6)-row halo
slab into VMEM once, forms all 16 ring diffs and the circular windowed min
entirely on-chip (f32 — Mosaic on v5e does not lower bf16 lane rotates), and writes one score tile back — HBM traffic drops
to ~2 passes over the image.

Same contract as ops/fast.fast_score_map: score(p) > t  <=>  p is a FAST-9
corner at threshold t; border pixels score 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam_system_tpu.ops.fast import ARC_LEN, CIRCLE

TILE_H = 32
HALO = 3   # ring radius
PAD = 4    # vertical halo (slab height TILE_H+2*PAD must be 8-aligned for DMA)


def _roll(a, shift: int, axis: int):
    """pltpu.roll with negative shifts wrapped (it requires shift >= 0)."""
    size = a.shape[axis]
    return pltpu.roll(a, shift % size, axis=axis)


def _kernel(img_ref, out_ref, scratch, diffs, sem, *, H, W, border, W_real,
            nms):
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(i * TILE_H, TILE_H + 2 * PAD), :],
        scratch, sem)
    cp.start()
    cp.wait()
    # Compute scores for TILE_H + 2 rows (one halo row each side) so the
    # fused 3x3 NMS sees cross-tile neighbors (the slab's +/-4-row halo
    # leaves +/-1 after the ring radius 3).
    TH2 = TILE_H + 2
    center = scratch[PAD - 1:PAD - 1 + TH2, :]
    for k in range(16):
        dy, dx = int(CIRCLE[k, 0]), int(CIRCLE[k, 1])
        ring = scratch[PAD - 1 + dy:PAD - 1 + dy + TH2, :]
        if dx != 0:
            ring = _roll(ring, -dx, axis=1)
        diffs[k] = ring - center
    d = diffs[:]                                   # [16, TH2, W]
    # Circular windowed min of length 9 along axis 0 (log-step doubling).
    m = jnp.minimum(d, _roll(d, -1, axis=0))   # win 2
    m = jnp.minimum(m, _roll(m, -2, axis=0))   # win 4
    m = jnp.minimum(m, _roll(m, -4, axis=0))   # win 8
    m = jnp.minimum(m, _roll(d, -(ARC_LEN - 1), axis=0))  # win 9
    bright = jnp.max(m, axis=0)
    # Dark arcs: windowed min of -d == -(windowed max of d).
    n = jnp.maximum(d, _roll(d, -1, axis=0))
    n = jnp.maximum(n, _roll(n, -2, axis=0))
    n = jnp.maximum(n, _roll(n, -4, axis=0))
    n = jnp.maximum(n, _roll(d, -(ARC_LEN - 1), axis=0))
    dark = jnp.max(-n, axis=0)
    score2 = jnp.maximum(bright, dark).astype(jnp.float32)  # [TH2, W]
    # Border mask BEFORE NMS (the detection region excludes the border, so
    # border pixels must not suppress interior ones — reference semantics).
    gy2 = i * TILE_H - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH2, W), 0)
    gx2 = jax.lax.broadcasted_iota(jnp.int32, (TH2, W), 1)
    ok2 = (gy2 >= border) & (gy2 < H - border) & (gx2 >= border) & (
        gx2 < W_real - border)
    score2 = jnp.where(ok2, score2, 0.0)
    score = score2[1:1 + TILE_H, :]
    if nms:
        # Fused 3x3 non-max suppression (same >= tie rule as ops/fast.nms3x3).
        rmax = jnp.maximum(jnp.maximum(score2[0:TILE_H, :], score2[1:TILE_H + 1, :]),
                           score2[2:TILE_H + 2, :])
        pooled = jnp.maximum(jnp.maximum(rmax, _roll(rmax, -1, axis=1)),
                             _roll(rmax, 1, axis=1))
        score = jnp.where(score >= pooled, score, 0.0)
    # Border mask in global coordinates.
    gy = i * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, W), 1)
    ok = (gy >= border) & (gy < H - border) & (gx >= border) & (
        gx < W_real - border)
    out_ref[0] = jnp.where(ok, score, 0.0)


@functools.partial(jax.jit, static_argnames=("border", "nms"))
def fast_score_map_pallas(img: jnp.ndarray, border: int,
                          nms: bool = False) -> jnp.ndarray:
    """img: f32[B,H,W] -> score f32[B,H,W]; nms=True additionally applies
    the fused 3x3 non-max suppression in VMEM. TPU-only (caller gates)."""
    B, H, W0 = img.shape
    n_tiles = -(-H // TILE_H)
    # Lane alignment: pad width to a multiple of 128 (pyramid levels have
    # arbitrary widths; unaligned DMA widths fail Mosaic lowering).
    W = -(-W0 // 128) * 128
    # Pad so every tile's haloed slab [i*TILE_H, i*TILE_H + TILE_H + 2*PAD)
    # is in-bounds: PAD rows on top, (n_tiles*TILE_H + PAD - H) on the bottom.
    pad_bottom = n_tiles * TILE_H + PAD - H
    x = jnp.pad(img, ((0, 0), (PAD, pad_bottom), (0, W - W0)))
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, border=border, W_real=W0,
                          nms=nms),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, W), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE_H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_H + 2 * PAD, W), jnp.float32),
            pltpu.VMEM((16, TILE_H + 2, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(x)
    return out[:, :H, :W0]


_DISABLED = False


def disable():
    """Runtime opt-out (e.g. bench fallback if the kernel fails on the
    deployed TPU generation)."""
    global _DISABLED
    _DISABLED = True


def use_pallas() -> bool:
    import os
    if _DISABLED or os.environ.get("ORB_SLAM_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"
