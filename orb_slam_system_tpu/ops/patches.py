"""Batched square-patch gathering around integer keypoint centers.

The TPU-native replacement for the reference's per-keypoint pointer walks
(IC_Angle src/ORBextractor.cc:21-48, computeOrbDescriptor :57-73): one big
gather producing [B, N, P, P] patches that downstream moment sums and
descriptor tests consume as dense batched reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """img: f32[B,H,W]; xy: i32[B,N,2] (x,y) integer centers.
    Returns patches f32[B,N,P,P] with P = 2*radius+1.

    Centers are clamped so the patch stays in-bounds; callers guarantee
    keypoints live inside the border margin so clamping is a no-op for valid
    keypoints.
    """
    B, H, W = img.shape
    P = 2 * radius + 1
    x = jnp.clip(xy[..., 0], radius, W - radius - 1)
    y = jnp.clip(xy[..., 1], radius, H - radius - 1)
    d = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
    rows = y[..., None] + d[None, None, :]          # [B,N,P]
    cols = x[..., None] + d[None, None, :]          # [B,N,P]
    flat_idx = rows[..., :, None] * W + cols[..., None, :]   # [B,N,P,P]

    def per_image(im, ix):
        return jnp.take(im.reshape(-1), ix.reshape(-1)).reshape(ix.shape)

    return jax.vmap(per_image)(img, flat_idx)
