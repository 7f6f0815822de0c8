#!/usr/bin/env python
"""Stub-ablation of the batched extractor: time the FULL fused program and
variants with one stage stubbed out, all in ONE process/window (tunnel
dispatch latency drifts between windows, so only same-run deltas are
meaningful — see CLAUDE.md). The stage cost = full - stubbed.

Variants:
  full            pyramid + FAST + select + gather/blur/moments + rBRIEF
  no_desc         descriptor contraction replaced by a zeros stand-in
  no_gather       gather/blur/moments + desc replaced (select output used)
  no_select       selection replaced by static xy (keeps everything else)
  fast_only       pyramid + FAST score maps only

Usage: python tools/tpu_stub_ablate.py   (on TPU, no env overrides)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(tag, fn, *args, iters=20, reps=3):
    out = fn(*args)
    assert np.asarray(out).size == 1, tag
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(np.asarray(out))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{tag}: {best:.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    _ = np.asarray(jnp.sum(jnp.ones((8, 128))))

    from orb_slam_system_tpu.config import ORBConfig
    from orb_slam_system_tpu.ops import fast as fast_ops
    from orb_slam_system_tpu.ops import gather_pallas, pyramid as pyr_ops
    from orb_slam_system_tpu.ops.brief import PATCH_RADIUS, compute_descriptors
    from orb_slam_system_tpu.ops.extractor import EDGE_MARGIN, ORBExtractor
    from orb_slam_system_tpu.ops.orientation import angles_from_moments

    H, W, B = 480, 640, 8
    cfg = ORBConfig(n_features=1000)
    ex = ORBExtractor(cfg, H, W)
    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (B, H // 8, W // 8)) * 255.0
    imgs = jnp.repeat(jnp.repeat(base, 8, axis=1), 8, axis=2)
    R_G = PATCH_RADIUS + 3
    rng = np.random.default_rng(0)
    # Static xy for the no_select variant (shape matches xy_all).
    n_slots = ex.n_slots
    xy_static = jnp.asarray(np.stack(
        [rng.integers(22, W - 22, size=(B, n_slots)),
         rng.integers(22, H - 22, size=(B, n_slots))],
        axis=-1).astype(np.int32))

    def pipeline(img, *, do_select=True, do_gather=True, do_desc=True):
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        scores = [ex._score_fn(levels[l], EDGE_MARGIN)
                  for l in range(len(levels)) if ex.budgets[l] > 0]
        acc = jnp.float32(0)
        if not do_select:
            xy_all = xy_static
            acc = acc + sum(jnp.sum(s) for s in scores)
        else:
            selections = fast_ops.select_keypoints_multi(
                scores, [b for b in ex.budgets if b > 0],
                ini_th=float(cfg.ini_th_fast), min_th=float(cfg.min_th_fast),
                cell=ex.cell, pre_nms=ex._pre_nms)
            xy_parts, resps, valids = [], [], []
            for l, (xy_l, resp, valid) in zip(
                    [i for i in range(len(levels)) if ex.budgets[i] > 0],
                    selections):
                xy_parts.append(xy_l + jnp.asarray(
                    [3, 3 + ex._canvas_offs[l]], jnp.int32))
                resps.append(resp)
                valids.append(valid)
            xy_all = jnp.concatenate(xy_parts, axis=1)
            acc = acc + sum(jnp.sum(r) for r in resps)
            acc = acc + sum(jnp.sum(v.astype(jnp.int32)) for v in valids)
        if not do_gather:
            return acc + jnp.sum(xy_all)
        canvas = jnp.zeros((B, ex._canvas_rows, ex._canvas_cols), img.dtype)
        for l, lvl in enumerate(levels):
            padded = jnp.pad(lvl, ((0, 0), (3, 3), (3, 3)), mode="reflect")
            canvas = jax.lax.dynamic_update_slice(
                canvas, padded, (0, ex._canvas_offs[l], 0))
        patches_d, mom = gather_pallas.gather_blur_moments_pallas(
            canvas, xy_all, R_G)
        ang = angles_from_moments(mom)
        acc = acc + jnp.sum(ang)
        if not do_desc:
            return acc + jnp.sum(patches_d[:, :, ::8, ::8])
        desc = compute_descriptors(patches_d, ang)
        return acc + jnp.sum(desc.astype(jnp.float32))

    variants = [
        ("full", dict()),
        ("no_desc", dict(do_desc=False)),
        ("no_gather", dict(do_gather=False)),
        ("no_select", dict(do_select=False)),
        ("fast_only", dict(do_select=False, do_gather=False)),
    ]
    res = {}
    for tag, kw in variants:
        fn = jax.jit(lambda im, kw=kw: pipeline(im, **kw))
        res[tag] = timeit(f"extract[{tag}]", fn, imgs)
    print(f"-> desc = {res['full'] - res['no_desc']:.2f} ms", flush=True)
    print(f"-> gather+blur+mom = {res['no_desc'] - res['no_gather']:.2f} ms",
          flush=True)
    print(f"-> select = {res['no_gather'] - res['fast_only']:.2f} ms "
          f"(no_select variant: {res['no_select']:.2f})", flush=True)
    print(f"-> pyramid+fast = {res['fast_only']:.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
