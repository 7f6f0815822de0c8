"""Pallas TPU kernel for batched square-patch gathering.

XLA's block gather moves ~7 KB per keypoint but runs latency-bound
(~3.5 GB/s effective). This kernel turns patch extraction into explicit
DMAs: each grid step prefetches its keypoints' coordinates from SMEM
(PrefetchScalarGridSpec), issues KPT double-buffered HBM->VMEM window
copies (sublane-8 / lane-128 aligned windows), and emits the exact patch
via an in-VMEM dynamic slice.

Same contract as ops/patches.gather_patches (radius 21 specialization used
by the extractor); TPU-only, caller gates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keypoints per grid step. Chunk width trades per-keypoint sequencing
# overhead (the align loop) against VMEM scratch and matmul granularity;
# override with ORB_SLAM_GATHER_KPT for A/B measurement. r4 same-window
# v5e A/B (tools/tpu_gather_chunk.py): 16/32/64 -> 2.75/2.70/2.67 ms per
# batch-8 level-0 call, bit-equal outputs — the kernel is NOT chunk-width
# bound (<3% spread). 64 also VMEM-OOMs at the extractor's real patch
# (P=37: scoped 18.89M > 16M limit on v5e), so 16 stays the default.
import os as _os
KPT = int(_os.environ.get("ORB_SLAM_GATHER_KPT", "16"))
WIN_W = 256      # DMA window width: 128-aligned start + patch fits
WIN_H = 56       # DMA window height: 8-aligned start + patch fits


def _kernel(ys_ref, xs_ref, img_ref, out_ref, win, sem, *, H, W, P,
            kpt):
    b = pl.program_id(0)
    j = pl.program_id(1)

    def corner(k):
        kp = j * kpt + k
        y0 = ys_ref[b, kp]
        x0 = xs_ref[b, kp]
        # DMA offsets must be tile-aligned (sublane 8, lane 128); the
        # residual offsets are resolved in VMEM below.
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        return y0, x0, ya, xa

    def get_dma(k):
        _, _, ya, xa = corner(k)
        return pltpu.make_async_copy(
            img_ref.at[b, pl.ds(ya, WIN_H), pl.ds(xa, WIN_W)],
            win.at[k], sem.at[k])

    # One window slot per keypoint: all kpt DMAs run concurrently and no
    # slot is ever reused within a program (slot reuse raced with the
    # in-flight reads of the previous occupant).
    for k in range(kpt):
        get_dma(k).start()
    for k in range(kpt):
        get_dma(k).wait()
        y0, x0, ya, xa = corner(k)
        oy = y0 - ya                          # in [0, 8)
        ox = x0 - xa                          # in [0, 128)
        # Residual offsets resolved by DYNAMIC f32 rotates on both axes
        # (dynamic sublane vector loads don't lower, but dynamic roll
        # does; it replaced an 8-way switch over static slices — the
        # branch tree per keypoint cost ~25% of the kernel).
        rows = pltpu.roll(win[k], WIN_H - oy, axis=0)[:P, :]
        rolled = pltpu.roll(rows, WIN_W - ox, axis=1)  # out[x] = rows[x+ox]
        out_ref[0, k] = rolled[:, :P]


@functools.partial(jax.jit, static_argnames=("radius", "kpt"))
def gather_patches_pallas(img: jnp.ndarray, xy: jnp.ndarray, radius: int,
                          kpt: int = 0):
    """img: f32[B,H,W]; xy: i32[B,N,2] (x,y) centers -> f32[B,N,P,P]."""
    kpt = kpt or KPT
    B, H, W0 = img.shape
    N = xy.shape[1]
    P = 2 * radius + 1
    # Pad enough that the aligned DMA window of ANY in-border keypoint fits
    # without clamping (clamping would shift near-edge patches): one extra
    # lane tile in x, two sublane tiles in y.
    W = -(-W0 // 128) * 128 + 128
    Hp = -(-H // 8) * 8 + 16
    x = jnp.pad(img, ((0, 0), (0, Hp - H), (0, W - W0)))
    # Clip so (a) the patch stays inside the ORIGINAL image (same semantics
    # as ops/patches.gather_patches) and (b) the aligned window start fits
    # the padded image: xa <= W-WIN_W requires x0 <= W-WIN_W+127, etc.
    x0 = jnp.clip(xy[..., 0] - radius, 0,
                  min(W0 - P, W - WIN_W + 127)).astype(jnp.int32)
    y0 = jnp.clip(xy[..., 1] - radius, 0,
                  min(H - P, Hp - WIN_H + 7)).astype(jnp.int32)
    n_pad = -(-N // kpt) * kpt
    if n_pad != N:
        x0 = jnp.pad(x0, ((0, 0), (0, n_pad - N)))
        y0 = jnp.pad(y0, ((0, 0), (0, n_pad - N)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_pad // kpt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, kpt, P, P), lambda b, j, ys, xs: (b, j, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kpt, WIN_H, WIN_W), img.dtype),
            pltpu.SemaphoreType.DMA((kpt,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, H=Hp, W=W, P=P, kpt=kpt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_pad, P, P), img.dtype),
    )(y0, x0, x)
    return out[:, :N]


def _kernel_fused(ys_ref, xs_ref, img_ref, wx_ref, wy_ref,
                  blur_ref, mom_ref, win, sem, *, P, PB, PO, taps, kpt):
    """Fused gather + 7x7 separable blur + IC-angle moments.

    Per keypoint: extract the P x P patch exactly as _kernel, then
    (a) valid-mode blur it to PB x PB for rBRIEF (replacing extractor.
    _blur_patches) and (b) reduce the unblurred PO x PO center against the
    circular moment weights (replacing orientation.ic_angles) — the 43x43
    raw patch never round-trips through HBM."""
    b = pl.program_id(0)
    j = pl.program_id(1)

    def corner(k):
        kp = j * kpt + k
        y0 = ys_ref[b, kp]
        x0 = xs_ref[b, kp]
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        return y0, x0, ya, xa

    def get_dma(k):
        _, _, ya, xa = corner(k)
        return pltpu.make_async_copy(
            img_ref.at[b, pl.ds(ya, WIN_H), pl.ds(xa, WIN_W)],
            win.at[k], sem.at[k])

    for k in range(kpt):
        get_dma(k).start()
    co = (P - PO) // 2                     # 31x31 orientation center
    for k in range(kpt):
        get_dma(k).wait()
        y0, x0, ya, xa = corner(k)
        oy = y0 - ya
        ox = x0 - xa
        rows = pltpu.roll(win[k], WIN_H - oy, axis=0)[:P, :]
        # The patch occupies lanes [0, P) after the roll; all further
        # compute runs on a single 128-lane tile (the kernel is VPU-bound,
        # and the full 256-lane window doubled every blur op).
        patch = pltpu.roll(rows, WIN_W - ox, axis=1)[:, :128]
        sub = patch[co:co + PO, co:co + PO]
        # Keep the moment reduction VECTORIZED (sublane sum -> [PO] lane
        # vector); a full scalar reduction per keypoint forces a vector->
        # scalar sync that serializes the whole program (~10x slowdown).
        mom_ref[0, k, 0, :] = jnp.sum(sub * wx_ref[...], axis=0)
        mom_ref[0, k, 1, :] = jnp.sum(sub * wy_ref[...], axis=0)
        # Same axis order as extractor._blur_patches (rows then columns)
        # so results stay bit-comparable with the XLA path.
        acc_v = None
        for i in range(7):
            t = patch[i:i + PB, :] * taps[i]
            acc_v = t if acc_v is None else acc_v + t
        acc = None
        for i in range(7):
            t = acc_v[:, i:i + PB] * taps[i]
            acc = t if acc is None else acc + t
        blur_ref[0, k] = acc


# Largest padded canvas (bytes) kept VMEM-resident per grid step; bigger
# canvases fall back to per-keypoint HBM window DMAs. ~4.5 MB covers the
# full 8-level 640x480 pyramid canvas; v5e VMEM is ~16 MB less scratch.
VMEM_CANVAS_BUDGET = 8 * 1024 * 1024


def _kernel_fused_resident(ys_ref, xs_ref, img_ref, wx_ref, wy_ref,
                           arow_ref, bcol_ref, blur_ref, mom_ref,
                           canvas, csem, patches,
                           *, P, PB, PO, taps, kpt):
    """_kernel_fused with the whole (batch-item) canvas VMEM-resident:
    the canvas is DMA'd HBM->VMEM ONCE per batch index (single-buffered
    scratch, ~7 MB for the full 8-level 640x480 pyramid canvas), and the
    per-keypoint window copies become VMEM->VMEM — cutting HBM traffic
    from ~57 KB/keypoint (aligned window, ~470 MB/batch8) to one canvas
    read per batch item (~56 MB/batch8).

    Round-3 restructuring (the r2 ablation showed this kernel
    per-keypoint-SEQUENCING bound, not bandwidth bound): the loop now only
    aligns each patch into a stacked [KPT, P, 128] scratch; the 7x7 blur
    runs ONCE for all KPT patches as two MXU matmuls (row pass = batched
    [PB, P] x [P, 128] dot, column pass = one banded [128, 128] matrix on
    the lane axis), and the IC-angle moment reductions vectorize across
    the keypoint axis — ~14 VPU ops/keypoint become 2 matmuls + 2
    reductions per 16 keypoints."""
    b = pl.program_id(0)
    j = pl.program_id(1)

    def canvas_dma():
        return pltpu.make_async_copy(img_ref.at[b], canvas, csem)

    @pl.when(j == 0)
    def _load_canvas():
        canvas_dma().start()
        canvas_dma().wait()

    co = (P - PO) // 2
    for k in range(kpt):
        kp = j * kpt + k
        y0 = ys_ref[b, kp]
        x0 = xs_ref[b, kp]
        ya = pl.multiple_of((y0 // 8) * 8, 8)
        xa = pl.multiple_of((x0 // 128) * 128, 128)
        oy = y0 - ya
        ox = x0 - xa
        # Tile-aligned dynamic vector load straight from the VMEM canvas —
        # no per-keypoint DMA/semaphore round trip (that fixed overhead,
        # not bandwidth, dominated the window-DMA formulation). Residual
        # offsets via DYNAMIC f32 rotates on both axes (a dynamic sublane
        # roll replaced the 8-way switch over static slices: bit-identical
        # and ~25% faster — the per-keypoint branch tree was sequencing
        # overhead).
        w = canvas[pl.ds(ya, WIN_H), pl.ds(xa, WIN_W)]
        rows = pltpu.roll(w, WIN_H - oy, axis=0)[:P, :]
        patches[k] = pltpu.roll(rows, WIN_W - ox, axis=1)[:, :128]
    pk = patches[...]                                   # [kpt, P, 128]
    sub = pk[:, co:co + PO, co:co + PO]                 # [KPT, PO, PO]
    mom_ref[0, :, 0, :] = jnp.sum(sub * wx_ref[...][None], axis=1)
    mom_ref[0, :, 1, :] = jnp.sum(sub * wy_ref[...][None], axis=1)
    # Row blur for ALL keypoints: [PB, P] x [KPT, P, 128] -> [KPT, PB, 128]
    # HIGHEST precision: the blurred values feed BINARY rBRIEF
    # comparisons; bf16 matmul passes would flip marginal bits vs the
    # exact shifted-add (XLA oracle) formulation.
    acc_v = jax.lax.dot_general(
        arow_ref[...], pk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # [PB, KPT, 128]
    # Column blur on the lane axis: one banded [128, 128] matrix.
    acc = jax.lax.dot_general(
        acc_v, bcol_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # [PB, KPT, 128]
    for k in range(kpt):
        blur_ref[0, k] = acc[:, k, :PB]


@functools.partial(jax.jit, static_argnames=("radius", "kpt"))
def gather_blur_moments_pallas(img: jnp.ndarray, xy: jnp.ndarray,
                               radius: int = 21, kpt: int = 0):
    """img: f32[B,H,W] (already reflect-padded for the blur halo by the
    caller, like gather_patches callers); xy: i32[B,N,2] patch centers in
    the padded image. Returns (blurred f32[B,N,PB,PB] with PB=P-6 and the
    patch center at index (PB-1)/2, moments f32[B,N,2] = (m10, m01) over
    the circular 31x31 IC-angle window of the unblurred patch)."""
    from orb_slam_system_tpu.ops.orientation import HALF_PATCH, moment_weights
    from orb_slam_system_tpu.ops.pyramid import gaussian_kernel_1d

    kpt = kpt or KPT
    B, H, W0 = img.shape
    N = xy.shape[1]
    P = 2 * radius + 1
    PB = P - 6
    PO = 2 * HALF_PATCH + 1
    assert PO <= P
    W = -(-W0 // 128) * 128 + 128
    Hp = -(-H // 8) * 8 + 16
    x = jnp.pad(img, ((0, 0), (0, Hp - H), (0, W - W0)))
    x0 = jnp.clip(xy[..., 0] - radius, 0,
                  min(W0 - P, W - WIN_W + 127)).astype(jnp.int32)
    y0 = jnp.clip(xy[..., 1] - radius, 0,
                  min(H - P, Hp - WIN_H + 7)).astype(jnp.int32)
    n_pad = -(-N // kpt) * kpt
    if n_pad != N:
        x0 = jnp.pad(x0, ((0, 0), (0, n_pad - N)))
        y0 = jnp.pad(y0, ((0, 0), (0, n_pad - N)))
    wx, wy = moment_weights()
    taps = tuple(float(v) for v in gaussian_kernel_1d(7, 2.0))
    import numpy as _np
    # Blur-as-matmul operands: row pass arow[r, r+i] = taps[i] (valid-mode
    # [PB, P] band), column pass bcol[c+i, c] = taps[i] ([128, 128] band —
    # only output lanes < PB are consumed).
    arow = _np.zeros((PB, P), _np.float32)
    bcol = _np.zeros((128, 128), _np.float32)
    for i, t in enumerate(taps):
        arow[_np.arange(PB), _np.arange(PB) + i] = t
        cc = _np.arange(0, 128 - i)
        bcol[cc + i, cc] = t
    resident = Hp * W * img.dtype.itemsize <= VMEM_CANVAS_BUDGET
    kern = _kernel_fused_resident if resident else _kernel_fused
    if resident:
        # Direct tile-aligned loads from the VMEM canvas: no per-keypoint
        # window scratch or DMA semaphores; stacked patch scratch feeds
        # the vectorized (matmul) blur.
        scratch = [pltpu.VMEM((Hp, W), img.dtype),
                   pltpu.SemaphoreType.DMA,
                   pltpu.VMEM((kpt, P, 128), img.dtype)]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((PO, PO), lambda b, j, ys, xs: (0, 0)),
            pl.BlockSpec((PO, PO), lambda b, j, ys, xs: (0, 0)),
            pl.BlockSpec((PB, P), lambda b, j, ys, xs: (0, 0)),
            pl.BlockSpec((128, 128), lambda b, j, ys, xs: (0, 0)),
        ]
        extra_in = (jnp.asarray(arow), jnp.asarray(bcol))
    else:
        scratch = [
            pltpu.VMEM((kpt, WIN_H, WIN_W), img.dtype),
            pltpu.SemaphoreType.DMA((kpt,)),
        ]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((PO, PO), lambda b, j, ys, xs: (0, 0)),
            pl.BlockSpec((PO, PO), lambda b, j, ys, xs: (0, 0)),
        ]
        extra_in = ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_pad // kpt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, kpt, PB, PB), lambda b, j, ys, xs: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpt, 2, PO), lambda b, j, ys, xs: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    blur, mom = pl.pallas_call(
        functools.partial(kern, P=P, PB=PB, PO=PO, taps=taps, kpt=kpt),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, PB, PB), img.dtype),
            jax.ShapeDtypeStruct((B, n_pad, 2, PO), jnp.float32),
        ],
    )(y0, x0, x, jnp.asarray(wx), jnp.asarray(wy), *extra_in)
    return blur[:, :N], jnp.sum(mom[:, :N], axis=-1)


_DISABLED = False


def use_pallas() -> bool:
    import os
    if _DISABLED or os.environ.get("ORB_SLAM_TPU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"
