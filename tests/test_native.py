"""Native C++ data loader: decode parity + prefetcher ordering."""

import numpy as np
import pytest

from orb_slam_system_tpu import native
from orb_slam_system_tpu.models.viewer import write_pgm


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_pgm_decode_exact(tmp_path, rng, have_native):
    img = rng.uniform(0, 255, size=(33, 47)).astype(np.float32)
    p = tmp_path / "a.pgm"
    write_pgm(str(p), img)
    out = native.decode_gray(str(p))
    np.testing.assert_array_equal(out, np.clip(img, 0, 255).astype(np.uint8)
                                  .astype(np.float32))


def test_png_decode_parity(tmp_path, rng, have_native):
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("no PIL to synthesize PNGs")
    img = rng.uniform(0, 255, size=(21, 38)).astype(np.uint8)
    p = tmp_path / "a.png"
    Image.fromarray(img).save(str(p))
    out = native.decode_gray(str(p))
    np.testing.assert_array_equal(out, img.astype(np.float32))
    # RGB png -> gray conversion matches the Python path's weights.
    rgb = rng.uniform(0, 255, size=(16, 20, 3)).astype(np.uint8)
    p2 = tmp_path / "rgb.png"
    Image.fromarray(rgb).save(str(p2))
    out2 = native.decode_gray(str(p2))
    ref = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    np.testing.assert_allclose(out2, ref, atol=0.01)


def test_png16_raw(tmp_path, rng, have_native):
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("no PIL to synthesize PNGs")
    d16 = rng.integers(0, 30000, size=(12, 17)).astype(np.uint16)
    p = tmp_path / "d.png"
    Image.fromarray(d16).save(str(p))
    out = native.decode_gray(str(p), raw16=True)
    np.testing.assert_array_equal(out, d16.astype(np.float32))


def test_prefetcher_ordered(tmp_path, have_native):
    paths = []
    for i in range(10):
        p = tmp_path / f"f{i}.pgm"
        write_pgm(str(p), np.full((6, 8), i * 7, np.float32))
        paths.append(str(p))
    pl = native.PrefetchLoader(paths, depth=4)
    for i in range(10):
        f = pl.fetch(i)
        assert f is not None and f.shape == (6, 8)
        assert abs(float(f[0, 0]) - i * 7) < 1
    pl.close()


def test_dataset_loader_uses_native(tmp_path, rng, have_native):
    from orb_slam_system_tpu.dataio.datasets import load_image_gray
    img = rng.uniform(0, 255, size=(9, 11)).astype(np.float32)
    p = tmp_path / "x.pgm"
    write_pgm(str(p), img)
    out = load_image_gray(str(p))
    assert out.shape == (9, 11)


def test_prefetcher_slow_consumer_no_deadlock(tmp_path, have_native):
    """Regression (round 5): workers claim an index BEFORE decoding, so a
    slow consumer let the ready ring fill with later indices while the
    needed one was stranded in a capacity-blocked worker's hand —
    consumer waited for the index, workers waited for space, deadlock
    (hit by the runbook stand-in: cold-compile tracking consumed at
    seconds/frame against 4 decode threads). The `wanted` bypass lets
    the stranded worker push the consumer's index past the gate.

    Frame 0 is much larger (slowest decode), so with an idle consumer
    the other workers deterministically fill the ring before worker 0
    finishes — the old code then deadlocked on the very first fetch."""
    import threading
    import time

    paths = []
    big = np.zeros((400, 500), np.float32)
    write_pgm(str(tmp_path / "f000.pgm"), big)
    paths.append(str(tmp_path / "f000.pgm"))
    for i in range(1, 30):
        p = tmp_path / f"f{i:03d}.pgm"
        write_pgm(str(p), np.full((6, 8), i, np.float32))
        paths.append(str(p))
    pl = native.PrefetchLoader(paths, depth=8)
    time.sleep(0.3)          # let the ring fill while the consumer idles
    done = {"ok": False}

    def consume():
        for i in range(30):
            f = pl.fetch(i)
            assert f is not None
            time.sleep(0.01)  # slow consumer
        done["ok"] = True

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    t.join(timeout=30.0)
    assert done["ok"], "prefetch ring deadlocked with a slow consumer"
    pl.close()
