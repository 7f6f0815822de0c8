#!/usr/bin/env python
"""Same-window ablation of the keypoint-selection stage (the biggest
extract stage per tools/tpu_stub_ablate.py): attribute its cost between
cell-candidate extraction, the radix top-n, and selection decode, and A/B
the radix against lax.top_k at the REAL fused multi-level shape.

Usage: python tools/tpu_select_ablate.py   (on TPU, no env overrides)
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
    from orb_slam_system_tpu.ops import pyramid as pyr_ops
    from orb_slam_system_tpu.ops.extractor import EDGE_MARGIN, ORBExtractor

    H, W, B = 480, 640, 8
    cfg = ORBConfig(n_features=1000)
    ex = ORBExtractor(cfg, H, W)
    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (B, H // 8, W // 8)) * 255.0
    imgs = jnp.repeat(jnp.repeat(base, 8, axis=1), 8, axis=2)

    budgets = [b for b in ex.budgets if b > 0]
    L = len(budgets)
    ini, mn = float(cfg.ini_th_fast), float(cfg.min_th_fast)
    K = 4

    def scores_of(img):
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        return [ex._score_fn(levels[l], EDGE_MARGIN) for l in range(L)]

    # Materialized score maps (so select rows time ONLY selection).
    scores = [jnp.asarray(s) for s in jax.jit(scores_of)(imgs)]

    def chk(fn):
        def wrapped(*args):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return jax.jit(wrapped)

    # Full select (radix path, as in production).
    timeit("select_full", chk(lambda *ss: fast_ops.select_keypoints_multi(
        list(ss), budgets, ini, mn, cell=ex.cell, pre_nms=ex._pre_nms)),
        *scores)

    # Cells only.
    timeit("select_cells_only", chk(lambda *ss: [
        fast_ops._cell_candidates(s, ini, mn, ex.cell, K, ex._pre_nms)[:2]
        for s in ss]), *scores)

    # Cells + order key (adds the key build).
    def cells_key(*ss):
        per = [fast_ops._cell_candidates(s, ini, mn, ex.cell, K, ex._pre_nms)
               for s in ss]
        C_max = max(v.shape[1] for v, _, _, _ in per)
        vals = jnp.stack([jnp.pad(v, ((0, 0), (0, C_max - v.shape[1]),
                                      (0, 0))) for v, _, _, _ in per])
        Rr = L * B
        return fast_ops._order_key(vals.reshape(Rr, C_max, K), K)
    timeit("select_cells+key", chk(cells_key), *scores)

    # Radix select on a materialized key (the [64, 4800] real shape).
    flat_key = jnp.asarray(jax.jit(
        lambda *ss: cells_key(*ss).reshape(L * B, -1))(*scores))
    n_rows = jnp.asarray(np.repeat(np.asarray(budgets, np.int32), B))
    n_out = int(max(budgets))
    print(f"# flat_key shape={flat_key.shape} n_out={n_out}", flush=True)
    timeit("radix_top_n_rows", chk(
        lambda k: fast_ops._top_n_select_rows(k, n_rows, n_out)), flat_key)
    timeit("lax_top_k(same shape)", chk(
        lambda k: jax.lax.top_k(k, n_out)), flat_key)
    timeit("lax_sort_full(same shape)", chk(
        lambda k: jax.lax.sort(k, dimension=1)), flat_key)

    # Radix internals: kth-pattern search alone vs the compaction tail.
    def radix_kth(k):
        u = fast_ops._sortable_bits(k)
        n_col = n_rows[:, None]
        nib_ids = jnp.arange(16, dtype=jnp.uint32)

        def body(i, prefix):
            shift = (jnp.uint32(28) - jnp.uint32(4) * i.astype(jnp.uint32))
            t = jax.lax.shift_right_logical(u, shift)
            p_hi = jax.lax.shift_right_logical(prefix, shift)
            in_pref = (t | jnp.uint32(15)) == (p_hi | jnp.uint32(15))[:, None]
            above = jnp.sum((t > (p_hi | jnp.uint32(15))[:, None])
                            .astype(jnp.int32), axis=1)
            nib = t & jnp.uint32(15)
            onehot = (nib[..., None] == nib_ids) & in_pref[..., None]
            hist = jnp.sum(onehot.astype(jnp.int32), axis=1)
            cum_ge = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
            count_ge = above[:, None] + cum_ge
            jstar = jnp.maximum(
                jnp.sum((count_ge >= n_col).astype(jnp.int32), axis=1) - 1, 0)
            return prefix | jax.lax.shift_left(
                jstar.astype(jnp.uint32), shift)

        return jax.lax.fori_loop(0, 8, body,
                                 jnp.zeros((flat_key.shape[0],), jnp.uint32))
    timeit("radix_kth_only", chk(radix_kth), flat_key)

    # Compaction tail alone (strict/tie masks + cumsum + scatter + gather).
    kth = jnp.asarray(jax.jit(radix_kth)(flat_key))[:, None]

    def tail(k, kth_):
        u = fast_ops._sortable_bits(k)
        n_col = n_rows[:, None]
        strict = u > kth_
        n_strict = jnp.sum(strict.astype(jnp.int32), axis=1, keepdims=True)
        ties = u == kth_
        tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)
        selected = strict | (ties & (tie_rank <= n_col - n_strict))
        pos = jnp.cumsum(selected.astype(jnp.int32), axis=1) - 1
        pos = jnp.where(selected, pos, n_out)
        src = jnp.broadcast_to(
            jnp.arange(k.shape[1], dtype=jnp.int32), k.shape)

        def scatter_row(p, s):
            return jnp.zeros((n_out,), jnp.int32).at[p].set(s, mode="drop")

        flat_idx = jax.vmap(scatter_row)(pos, src)
        keyvals = jnp.take_along_axis(k, flat_idx, axis=1)
        return flat_idx, keyvals
    timeit("radix_tail_only", chk(tail), flat_key, kth)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
