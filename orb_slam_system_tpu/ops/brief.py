"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Replaces reference computeOrbDescriptor (src/ORBextractor.cc:57-73) + the
256-pair sampling pattern (:75-113).

Design notes:
  * The sampling pattern is the STANDARD published ORB table (see
    ops/brief_pattern.py for provenance: recovered empirically from OpenCV
    behavior, not copied; the reference fork's own copy of the table is
    truncated/corrupted — a §0.1-class fork bug). Using the standard table
    makes descriptors bit-compatible with OpenCV ORB and with the stock
    ORBvoc.txt vocabulary, which was trained on those descriptors.
    Bit/byte layout also matches: bit i of little-endian byte j = test
    8*j + i, so packed uint32[8] words viewed as uint8[32] equal OpenCV
    descriptor rows.
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
PATCH_RADIUS = 18     # gathered patch radius; max rotated |offset| = round(hypot(13,13)) = 18


def make_pattern() -> np.ndarray:
    """The standard ORB BRIEF pattern: int32[256, 4] rows (x1, y1, x2, y2).

    Max test-point norm is hypot(13,13) = 18.38, so every rotation-rounded
    offset stays within PATCH_RADIUS=18 (asserted when building the binned
    test matrices)."""
    from orb_slam_system_tpu.ops.brief_pattern import ORB_PATTERN

    return ORB_PATTERN


_PATTERN = make_pattern()

# Angle quantization for the MXU descriptor path: 32 bins (11.25 deg). The
# rotated test offsets are integer-rounded anyway (sub-pixel precision is
# already quantized); bin-center rotation changes offsets by < 1px for the
# typical |offset| ~ 6px, on par with the rounding the reference applies.
N_ANGLE_BINS = 32


def _binned_test_matrices():
    """Static per-bin one-hot difference matrices E[a] in {-1,0,+1} of shape
    [P*P, 256] with descriptor bit b of a keypoint in bin a given by
    (patch_flat @ E[a])[b] > 0  (i.e. I[p2] - I[p1] > 0  <=>  t1 < t2)."""
    P = 2 * PATCH_RADIUS + 1
    E = np.zeros((N_ANGLE_BINS, P * P, N_BITS), np.float32)
    pat = _PATTERN.astype(np.float64)
    for a in range(N_ANGLE_BINS):
        th = 2 * np.pi * a / N_ANGLE_BINS
        ca, sa = np.cos(th), np.sin(th)
        for b in range(N_BITS):
            x1, y1, x2, y2 = pat[b]
            xr1 = int(round(x1 * ca - y1 * sa)) + PATCH_RADIUS
            yr1 = int(round(x1 * sa + y1 * ca)) + PATCH_RADIUS
            xr2 = int(round(x2 * ca - y2 * sa)) + PATCH_RADIUS
            yr2 = int(round(x2 * sa + y2 * ca)) + PATCH_RADIUS
            assert 0 <= min(xr1, yr1, xr2, yr2) and max(xr1, yr1, xr2, yr2) < P
            E[a, yr1 * P + xr1, b] -= 1.0
            E[a, yr2 * P + xr2, b] += 1.0
    return E


# Stored pre-cast to bfloat16 so the jitted constant needs no compile-time
# f32 transpose/convert pass (XLA constant-folding of the [32,1369,256]
# tensor cost ~4s per compile otherwise).
import ml_dtypes  # ships with jax

_E_BINNED = _binned_test_matrices().astype(ml_dtypes.bfloat16)


def compute_descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """patches: f32[B,N,P,P] from the *blurred* level image, P=2*18+1=37;
    angles: f32[B,N] radians. Returns uint32[B,N,8] packed descriptors.

    MXU formulation: instead of 512 rotated scalar gathers per keypoint
    (gather-bound on TPU), the intensity differences for ALL angle bins are
    computed as one bf16 contraction against static +/-1 test matrices, and
    each keypoint selects its bin's row — turning the descriptor into a
    matmul (SURVEY.md §7.1 MXU-first rule)."""
    B, N, P, _ = patches.shape
    assert P == 2 * PATCH_RADIUS + 1
    bin_f = angles * (N_ANGLE_BINS / (2 * jnp.pi))
    bins = jnp.round(bin_f).astype(jnp.int32) % N_ANGLE_BINS   # [B,N]
    flat = patches.reshape(B, N, P * P).astype(jnp.bfloat16)
    E = jnp.asarray(_E_BINNED, jnp.bfloat16)                   # [A,PP,256]
    # diffs[a, b*n, bit] = patch . E[a]  -> select per-keypoint bin.
    diffs = jnp.einsum("bnp,apc->banc", flat, E,
                       preferred_element_type=jnp.float32)     # [B,A,N,256]
    sel = jnp.take_along_axis(
        diffs, bins[:, None, :, None].astype(jnp.int32), axis=1)[:, 0]
    bits = (sel > 0).astype(jnp.uint32)                        # [B,N,256]
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
