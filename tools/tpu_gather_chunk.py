"""A/B the gather kernel's keypoint-chunk width on the real TPU.

VERDICT r3 #4: the fused gather+blur+moments kernel is per-keypoint-
sequencing bound (~4.3 ms/batch8 at chunk 16); this measures kpt in
{16, 32, 64} IN THE SAME TUNNEL WINDOW (CLAUDE.md measurement
discipline: numbers from different windows vary up to 5x), pipelined
x20 per rep with a single scalar-fetch sync, and bit-compares outputs
across chunk widths.

Run on TPU (no env overrides): python tools/tpu_gather_chunk.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from orb_slam_system_tpu.ops import gather_pallas

    B, H, W = 8, 486, 646      # level-0 canvas-ish (pre-padded halo size)
    N = 1024
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))
    xy = jnp.asarray(np.stack([
        rng.integers(21, W - 22, size=(B, N)),
        rng.integers(21, H - 22, size=(B, N))], axis=-1).astype(np.int32))

    results = {}
    outs = {}
    for kpt in (16, 32, 64):
        try:
            f = jax.jit(lambda im, p, k=kpt:
                        gather_pallas.gather_blur_moments_pallas(
                            im, p, 21, kpt=k))
            blur, mom = f(img, xy)       # compile + warm
            outs[kpt] = (np.asarray(blur[0, :4]), np.asarray(mom[0, :4]))
            best = float("inf")
            for _rep in range(5):
                t0 = time.perf_counter()
                for _ in range(20):
                    blur, mom = f(img, xy)
                _ = float(jnp.sum(mom[0, 0]))   # scalar fetch = sync
                best = min(best, (time.perf_counter() - t0) / 20)
            results[f"kpt{kpt}_ms"] = round(best * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            results[f"kpt{kpt}_error"] = f"{type(e).__name__}: {e}"
    # Bit-equality across chunk widths (same math, different tiling).
    base = outs.get(16)
    for kpt, (b, m) in outs.items():
        if base is not None and kpt != 16:
            results[f"kpt{kpt}_bit_equal"] = bool(
                (b == base[0]).all() and (m == base[1]).all())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
