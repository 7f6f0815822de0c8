"""Per-stage TPU timing ablation for the extractor front end.

Times each candidate kernel separately to attribute regressions:
gather variants, blur, descriptor variants, full extractor configs.
Run backgrounded; serializes all TPU work in one process.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(tag, fn, *args, iters=20):
    """fn must be jitted and reduce to a SCALAR checksum on device: on the
    axon tunnel, fetching a full output array costs array-size/tunnel-BW
    and swamps the kernel time (first ablation attempt measured exactly
    that)."""
    out = fn(*args)
    assert np.asarray(out).size == 1, tag
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {dt:.2f} ms", flush=True)
    return dt


def chk(fn):
    """Wrap fn -> scalar checksum (sum of float-cast leaves)."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    return jax.jit(wrapped)


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    _ = np.asarray(jnp.sum(jnp.ones((8, 128))))

    from orb_slam_system_tpu.config import ORBConfig
    from orb_slam_system_tpu.ops import brief, brief_pallas, gather_pallas
    from orb_slam_system_tpu.ops.extractor import ORBExtractor, _blur_patches
    from orb_slam_system_tpu.ops.patches import gather_patches

    H, W, B, N = 480, 640, 8, 1024
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (B, H // 8, W // 8)) * 255.0
    imgs = jnp.repeat(jnp.repeat(base, 8, axis=1), 8, axis=2)
    xy = jnp.asarray(np.stack(
        [rng.integers(22, W - 22, size=(B, N)),
         rng.integers(22, H - 22, size=(B, N))], axis=-1).astype(np.int32))

    # --- gather variants (level-0-sized; the real pipeline gathers per level)
    # Two xy sets: random (worst case) and raster-sorted (matches the
    # cell-major order select_keypoints emits).
    xy_sorted = jnp.asarray(np.stack(
        [np.sort(np.asarray(xy[..., 0]), axis=1),
         np.sort(np.asarray(xy[..., 1]), axis=1)], axis=-1))
    g_old = chk(lambda im, p: gather_pallas.gather_patches_pallas(im, p, 21))
    g_fused = chk(
        lambda im, p: gather_pallas.gather_blur_moments_pallas(im, p, 21))
    timeit("gather_old_pallas[B8,N1024,43x43]", g_old, imgs, xy)
    timeit("gather_old_pallas[sorted-y]", g_old, imgs, xy_sorted)
    timeit("gather_fused_blur_mom", g_fused, imgs, xy)
    timeit("gather_fused_blur_mom[sorted-y]", g_fused, imgs, xy_sorted)

    patches = jax.jit(
        lambda im, p: gather_pallas.gather_patches_pallas(im, p, 21))(imgs, xy)
    timeit("xla_blur_patches", chk(_blur_patches), patches)

    # --- descriptor variants on fixed blurred patches
    pat_d = jnp.asarray(
        rng.integers(0, 256, size=(B, N, 37, 37)).astype(np.float32))
    ang = jnp.asarray(
        rng.uniform(0, 2 * np.pi, size=(B, N)).astype(np.float32))
    timeit("desc_dense_einsum", chk(brief.compute_descriptors_dense),
           pat_d, ang)
    timeit("desc_binned_pallas", chk(brief.compute_descriptors), pat_d, ang)
    brief_pallas._DISABLED = True
    timeit("desc_binned_xla", chk(brief.compute_descriptors), pat_d, ang)
    brief_pallas._DISABLED = False

    # --- chunk layout overhead alone
    bins = jnp.asarray(rng.integers(0, 32, size=(B * N,)).astype(np.int32))
    n_chunks = -(-B * N // brief.CHUNK) + brief.N_ANGLE_BINS
    timeit("chunk_layout", chk(
        lambda b: brief._chunk_layout(b, n_chunks)), bins)

    # --- descriptor-path data movement, one op at a time (attributes the
    # non-matmul cost of compute_descriptors: [37,37]->flat relayout + bf16
    # cast, the bin-sorted row gather, the unsort gather, bit packing)
    M = B * N
    PPv = 37 * 37
    S = n_chunks * brief.CHUNK
    pidx = jnp.asarray(rng.integers(0, M + 1, size=(S,)).astype(np.int32))
    slot = jnp.asarray(rng.permutation(S)[:M].astype(np.int32))
    timeit("desc_reshape_cast", chk(
        lambda p: p.reshape(M, PPv).astype(jnp.bfloat16)), pat_d)
    flatb = jnp.asarray(
        rng.integers(0, 256, size=(M + 1, PPv)).astype(np.float32)
    ).astype(jnp.bfloat16)
    timeit("desc_row_gather[S,1369]", chk(lambda f, i: f[i]), flatb, pidx)
    diffs_f = jnp.asarray(rng.normal(size=(S, 256)).astype(np.float32))
    timeit("desc_unsort[M,256]", chk(lambda d, s: d[s]), diffs_f, slot)
    bits_u = (diffs_f[slot] > 0).astype(jnp.uint32)
    timeit("desc_pack_bits", chk(
        lambda b: brief.pack_bits(b).astype(jnp.float32)), bits_u)

    # --- brief pallas kernel alone on pre-sorted input
    S = n_chunks * brief.CHUNK
    p_sorted = jnp.asarray(
        rng.integers(0, 256, size=(S, 1369)).astype(np.float32)
    ).astype(jnp.bfloat16)
    cb = jnp.asarray(np.sort(rng.integers(0, 32, size=(n_chunks,))
                             ).astype(np.int32))
    timeit("brief_pallas_kernel", chk(brief_pallas.binned_diffs_pallas),
           p_sorted, cb)

    # --- keypoint selection A/B: radix threshold vs lax.top_k
    from orb_slam_system_tpu.ops import fast as fast_ops
    flat_key = jnp.asarray(
        rng.normal(size=(B, 4800)).astype(np.float32))
    timeit("select_threshold[B8,M4800,n265]",
           chk(lambda k: fast_ops._top_n_select(k, 265)[0]), flat_key)
    timeit("select_topk[B8,M4800,n265]",
           chk(lambda k: jax.lax.top_k(k, 265)[1]), flat_key)

    # --- full extractor configs
    cfg = ORBConfig(n_features=1000)
    for tag, gdis, bdis in [("extract[fusedG+palB]", False, False),
                            ("extract[fusedG+xlaB]", False, True),
                            ("extract[oldG+palB]", "old", False),
                            ("extract[xlaG+xlaB]", True, True)]:
        if gdis == "old":
            gather_pallas._DISABLED = False
            ex = ORBExtractor(cfg, H, W)
            ex._fused_gather = False  # old pallas gather + XLA blur/moments
            ex._fn = jax.jit(ex._extract)
            brief_pallas._DISABLED = bool(bdis)
        else:
            gather_pallas._DISABLED = bool(gdis)
            brief_pallas._DISABLED = bool(bdis)
            ex = ORBExtractor(cfg, H, W)
        try:
            timeit(tag, chk(lambda im: ex._extract(im).desc), imgs)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
        gather_pallas._DISABLED = False
        brief_pallas._DISABLED = False

    # --- batch-1 extractor stage ablation (the steady-state tracking path
    # runs B=1 per frame; at B=8 the extractor costs ~1.2 ms/frame but at
    # B=1 ~10 ms — these rows attribute the latency-bound stage).
    img1 = imgs[:1]
    ex1 = ORBExtractor(cfg, H, W)
    timeit("extract[B1]", chk(lambda im: ex1._extract(im).desc), img1)
    from orb_slam_system_tpu.ops import pyramid as pyr_ops
    lvls = [img1]
    hh, ww = H, W
    for _ in range(7):
        hh, ww = int(hh / 1.2), int(ww / 1.2)
        lvls.append(pyr_ops.resize_bilinear_mxu(img1, hh, ww))
    timeit("B1_pyramid", chk(lambda im: [
        pyr_ops.resize_bilinear_mxu(im, int(H / 1.2 ** l),
                                    int(W / 1.2 ** l))
        for l in range(1, 8)]), img1)
    timeit("B1_fast_scores", chk(lambda ims: [
        fast_ops.fast_score_map(lv, 19) for lv in ims]), lvls)
    scores1 = [fast_ops.fast_score_map(lv, 19) for lv in lvls]
    budgets = ex1.budgets if hasattr(ex1, "budgets") else [265] * 8
    timeit("B1_select_multi", chk(lambda ss: [
        x for tup in fast_ops.select_keypoints_multi(ss, budgets, 20.0, 7.0)
        for x in tup]), scores1)
    xy1 = xy[:1]
    timeit("B1_gather_fused", chk(
        lambda im, p: gather_pallas.gather_blur_moments_pallas(im, p, 21)),
        img1, xy1)
    timeit("B1_desc_binned", chk(brief.compute_descriptors),
           pat_d[:1], ang[:1])

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
