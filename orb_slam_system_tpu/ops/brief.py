"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Replaces reference computeOrbDescriptor (src/ORBextractor.cc:57-73) + the
256-pair sampling pattern (:75-113).

Design notes:
  * The sampling pattern is NOT copied from the reference: we generate a
    deterministic isotropic-Gaussian pair pattern (BRIEF-style, sigma =
    patch/5, fixed seed) constrained to a disk so that any rotation of any
    test point stays inside the gathered patch. Descriptor *self-consistency*
    is what the pipeline needs (matching our descriptors against our
    descriptors); there is no dependency on OpenCV bit layout. Downstream
    quality is gated on matching/ATE metrics, per SURVEY.md §7.3.
  * Rotation: test offsets are rotated by the keypoint angle with the same
    round-to-integer semantics as the reference's GET_VALUE macro, i.e.
    x' = round(x cos - y sin), y' = round(x sin + y cos).
  * All keypoints' 512 lookups are one take_along_axis gather from the
    already-gathered blurred patch [B,N,P,P]; the comparison and bit packing
    are dense VPU ops producing uint32[B,N,8].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

N_BITS = 256
PATCH_RADIUS = 18     # gathered patch radius; max |offset| 16.5 + rotation rounding < 18
_MAX_NORM = 16.0      # pattern points constrained to this disk


def make_pattern(seed: int = 42) -> np.ndarray:
    """Deterministic BRIEF pattern: int32[256, 4] rows (x1, y1, x2, y2)."""
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = []
    while len(pts) < N_BITS:
        p = rng.normal(scale=sigma, size=4)
        p = np.round(p)
        if np.hypot(p[0], p[1]) <= _MAX_NORM and np.hypot(p[2], p[3]) <= _MAX_NORM:
            if (p[0], p[1]) != (p[2], p[3]):
                pts.append(p)
    return np.asarray(pts, dtype=np.int32)


_PATTERN = make_pattern()


def compute_descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """patches: f32[B,N,P,P] from the *blurred* level image, P=2*18+1=37;
    angles: f32[B,N] radians. Returns uint32[B,N,8] packed descriptors."""
    B, N, P, _ = patches.shape
    assert P == 2 * PATCH_RADIUS + 1
    pat = jnp.asarray(_PATTERN, jnp.float32)           # [256,4]
    ca = jnp.cos(angles)[..., None]                    # [B,N,1]
    sa = jnp.sin(angles)[..., None]
    x1, y1, x2, y2 = pat[:, 0], pat[:, 1], pat[:, 2], pat[:, 3]

    def rot(x, y):
        xr = jnp.round(x * ca - y * sa).astype(jnp.int32) + PATCH_RADIUS
        yr = jnp.round(x * sa + y * ca).astype(jnp.int32) + PATCH_RADIUS
        return yr * P + xr                              # [B,N,256]

    idx1 = rot(x1, y1)
    idx2 = rot(x2, y2)
    flat = patches.reshape(B, N, P * P)
    t1 = jnp.take_along_axis(flat, idx1, axis=-1)
    t2 = jnp.take_along_axis(flat, idx2, axis=-1)
    bits = (t1 < t2).astype(jnp.uint32)                 # [B,N,256]
    return pack_bits(bits)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """bits: uint32[..., 256] of 0/1 -> packed uint32[..., 8], bit i of word w
    = test index w*32 + i."""
    *lead, nb = bits.shape
    assert nb == N_BITS
    grouped = bits.reshape(*lead, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(grouped << shifts, axis=-1).astype(jnp.uint32)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """packed uint32[..., 8] -> bits uint32[..., 256]."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], N_BITS)
