"""TPU front-end validation + timing for the fused extractor path.

Compares the full-Pallas extractor (DMA gather + in-VMEM blur + IC moments
+ binned-chunk rBRIEF kernel) against the XLA formulation on the real TPU,
reports descriptor Hamming deltas (float-tie blur flips only) and per-path
timings. Run backgrounded; serializes all TPU work in one process.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return np.asarray(x)  # axon tunnel: only a value fetch synchronizes


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    # Probe: tiny op with value fetch.
    t0 = time.perf_counter()
    v = fetch(jnp.sum(jnp.ones((8, 128))))
    print(f"probe ok ({v}) in {time.perf_counter() - t0:.2f}s", flush=True)

    from orb_slam_system_tpu.config import ORBConfig
    from orb_slam_system_tpu.ops import brief_pallas, fast_pallas, gather_pallas
    from orb_slam_system_tpu.ops.extractor import ORBExtractor

    H, W, B = 480, 640, 8
    cfg = ORBConfig(n_features=1000)

    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (B, H // 8, W // 8)) * 255.0
    imgs = jnp.repeat(jnp.repeat(base, 8, axis=1), 8, axis=2)

    def run(tag, extractor, iters=20):
        t0 = time.perf_counter()
        f = extractor(imgs)
        d = fetch(f.desc)
        v = fetch(f.valid)
        a = fetch(f.angle)
        xy = fetch(f.xy)
        print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s "
              f"valid/frame={v.sum() / B:.0f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            f = extractor(imgs)
        _ = fetch(f.desc[0, 0, 0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt * 1e3:.2f} ms/batch{B}", flush=True)
        return d, v, a, xy

    ex_fused = ORBExtractor(cfg, H, W)
    assert ex_fused._fused_gather, "expected Pallas fused path on TPU"
    d1, v1, a1, xy1 = run("fused-pallas", ex_fused)

    gather_pallas._DISABLED = True
    brief_pallas._DISABLED = True
    ex_xla = ORBExtractor(cfg, H, W)
    assert not ex_xla._fused_gather
    d2, v2, a2, xy2 = run("xla-gather+binned-xla", ex_xla)
    gather_pallas._DISABLED = False
    brief_pallas._DISABLED = False

    assert (v1 == v2).all(), "validity mismatch"
    assert (xy1 == xy2).all(), "keypoint mismatch"
    m = v1
    bits = np.bitwise_count(d1 ^ d2).sum(axis=-1)[m]
    dang = np.abs(a1 - a2)[m]
    dang = np.minimum(dang, 2 * np.pi - dang)
    print(f"desc hamming: mean={bits.mean():.3f} max={bits.max()} "
          f"frac_nonzero={(bits > 0).mean():.4f}", flush=True)
    print(f"angle delta: max={dang.max():.2e} rad", flush=True)
    # Paths agree up to float-tie flips (blur rounding + moment precision
    # on near-isotropic patches); material divergence trips these gates.
    assert bits.mean() <= 2.0 and (bits > 0).mean() <= 0.05, \
        "descriptor mismatch"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
