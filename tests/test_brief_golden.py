"""Golden-descriptor test: our rBRIEF bits must match OpenCV ORB.

This is what makes "drop-in ORBvoc.txt support" real: the stock vocabulary
was trained on OpenCV ORB descriptors, so our descriptors must be
bit-compatible (standard bit_pattern_31_ table, same rotation rounding,
same little-endian bit packing; reference src/ORBextractor.cc:57-113).

OpenCV's fixed-point Gaussian blur rounds +-1 differently from a float
blur on near-tie intensity pairs, so a few bits per descriptor may flip;
the test gates on a small Hamming tolerance rather than exact equality,
and on exact equality of the test-pair table semantics at angle 0 when we
feed both sides the SAME blurred image.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from orb_slam_system_tpu.ops.brief import (  # noqa: E402
    N_ANGLE_BINS, PATCH_RADIUS, compute_descriptors, make_pattern)


def _gather_patches(img_blur, pts):
    R = PATCH_RADIUS
    return np.stack([
        img_blur[y - R:y + R + 1, x - R:x + R + 1].astype(np.float32)
        for x, y in pts
    ])


def _our_desc_bytes(patches, angles_rad):
    desc = np.asarray(compute_descriptors(
        jnp.asarray(patches[None]), jnp.asarray(angles_rad[None],
                                                jnp.float32)))[0]
    return desc.astype("<u4").view(np.uint8).reshape(len(patches), 32)


def test_descriptor_bits_match_opencv():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(200, 200), dtype=np.uint8)
    blur = cv2.GaussianBlur(img, (7, 7), 2, sigmaY=2,
                            borderType=cv2.BORDER_REFLECT_101)

    # Keypoints at angle-bin centers so our 32-bin rotation is exact.
    bin_deg = 360.0 / N_ANGLE_BINS
    cases = [(60, 60, 0), (120, 80, 1), (90, 140, 8),
             (140, 60, 17), (70, 120, 31), (100, 100, 24)]
    kps = [cv2.KeyPoint(float(x), float(y), 31.0, b * bin_deg, 0.0, 0)
           for x, y, b in cases]
    _, golden = cv2.ORB_create().compute(img, kps)
    assert golden.shape == (len(cases), 32)

    pts = [(x, y) for x, y, _ in cases]
    angles = np.asarray([b * bin_deg for _, _, b in cases]) * np.pi / 180.0
    ours = _our_desc_bytes(_gather_patches(blur, pts), angles)

    ham = np.bitwise_count(ours ^ golden).sum(axis=1)
    # Near-tie blur-rounding flips only: empirically 0-3 bits of 256.
    assert ham.max() <= 8, ham
    assert ham.mean() <= 4, ham


def test_pattern_table_semantics_exact():
    """At angle 0, with the SAME blurred image on both sides, our bits are
    exactly tau(p1, p2) = [I(p1) < I(p2)] over the standard table."""
    rng = np.random.default_rng(11)
    blur = rng.integers(0, 256, size=(120, 120)).astype(np.float32)
    pat = make_pattern()
    pts = [(40, 40), (60, 70), (80, 50)]
    ours = _our_desc_bytes(_gather_patches(blur, pts),
                           np.zeros(len(pts), np.float32))
    for n, (x, y) in enumerate(pts):
        t1 = blur[y + pat[:, 1], x + pat[:, 0]]
        t2 = blur[y + pat[:, 3], x + pat[:, 2]]
        expect = np.packbits((t1 < t2).astype(np.uint8), bitorder="little")
        np.testing.assert_array_equal(ours[n], expect)
