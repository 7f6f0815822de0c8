"""Synthesize + benchmark a REAL-SCALE ORBvoc.txt (k=10, L=6, ~1.11M
nodes, ~140 MB) and prove the vocabulary path at the reference's actual
size (the shipped ORBvoc.txt is k=10 L=6; reference
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1342-1420 text format:
header `k L scoring weighting`, then one `parent is_leaf 32-bytes weight`
line per node, children contiguous in save order).

The real artifact cannot be fetched in this environment (no egress), so
the tree here is synthetic: a full 10-ary tree of depth 6 with random
binary centroids and IDF-like leaf weights. Descent latency, load/cache
cost and memory are structure-determined, not content-determined, so the
measurements transfer to the real file.

Usage:
  python tools/make_full_vocab.py out.txt [--k 10] [--L 6] [--bench]

--bench loads the generated file (text parse + npz cache build), reloads
from cache, runs host + device transforms of 1000 descriptors, and
prints a JSON summary.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def generate(path: str, k: int = 10, L: int = 6, seed: int = 0,
             verbose: bool = True):
    """Write a full k-ary depth-L vocabulary in ORBvoc.txt format.

    Nodes are emitted in BFS order (level by level), which keeps each
    parent's children contiguous — the save-order contract the loader's
    children-table construction relies on."""
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    with open(path, "w") as f:
        # Header: k L scoring_type weighting_type (L1_NORM=0, TF_IDF=0).
        f.write(f"{k} {L} 0 0\n")
        first_id = 1
        parent_first = 0
        n_parents = 1
        for lvl in range(1, L + 1):
            n_nodes = n_parents * k
            parents = np.repeat(
                np.arange(parent_first, parent_first + n_parents,
                          dtype=np.int64), k)
            is_leaf = int(lvl == L)
            descs = rng.integers(0, 256, size=(n_nodes, 32), dtype=np.uint8)
            if is_leaf:
                # IDF-like weights: most words rare (high weight), some
                # common — an exponential spread like the real file's.
                w = rng.exponential(scale=1.0, size=n_nodes).astype(
                    np.float32) * 1e-4
            else:
                w = np.zeros(n_nodes, np.float32)
            arr = np.empty((n_nodes, 35), np.float64)
            arr[:, 0] = parents
            arr[:, 1] = is_leaf
            arr[:, 2:34] = descs
            arr[:, 34] = w
            np.savetxt(f, arr, fmt="%d %d" + " %d" * 32 + " %.8g")
            if verbose:
                print(f"# level {lvl}: {n_nodes} nodes "
                      f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr,
                      flush=True)
            parent_first = first_id
            first_id += n_nodes
            n_parents = n_nodes
    return time.perf_counter() - t0


def bench(path: str, n_desc: int = 1000, seed: int = 1):
    from orb_slam_system_tpu.vocab.vocabulary import Vocabulary

    out = {"file_mb": round(os.path.getsize(path) / 1e6, 1)}
    cache = path + ".npz"
    if os.path.exists(cache):
        os.unlink(cache)
    t0 = time.perf_counter()
    voc = Vocabulary.load(path)                 # text parse + cache build
    out["load_text_s"] = round(time.perf_counter() - t0, 2)
    out["n_nodes"] = int(voc.node_parent.shape[0])
    out["n_words"] = int(voc.n_words)
    out["cache_mb"] = round(os.path.getsize(cache) / 1e6, 1)
    t0 = time.perf_counter()
    voc2 = Vocabulary.load(path)                # cached reload
    out["load_cache_s"] = round(time.perf_counter() - t0, 2)
    assert voc2.n_words == voc.n_words
    rng = np.random.default_rng(seed)
    desc = rng.integers(0, 2 ** 32, size=(n_desc, 8), dtype=np.uint32)
    valid = np.ones(n_desc, bool)
    # Host descent (the per-frame tracking path).
    wid, ww, nid = voc.transform(desc, valid)
    t0 = time.perf_counter()
    for _ in range(5):
        wid, ww, nid = voc.transform(desc, valid)
    out["transform_host_ms"] = round(
        (time.perf_counter() - t0) / 5 * 1e3, 1)
    out["words_hit"] = int(len(np.unique(wid[wid >= 0])))
    # Device descent (bulk path) — bit-equality vs host is the contract.
    try:
        import jax.numpy as jnp
        wid_d, ww_d, nid_d = voc.transform_device(
            jnp.asarray(desc), jnp.asarray(valid))
        wid_d = np.asarray(wid_d)
        t0 = time.perf_counter()
        for _ in range(5):
            r = voc.transform_device(jnp.asarray(desc), jnp.asarray(valid))
            _ = np.asarray(r[0])
        out["transform_device_ms"] = round(
            (time.perf_counter() - t0) / 5 * 1e3, 1)
        out["device_bit_equal"] = bool((np.asarray(wid_d) == wid).all())
    except Exception as e:  # noqa: BLE001 — device path optional here
        out["transform_device_error"] = f"{type(e).__name__}: {e}"
    # BoW scoring across random frames (loop-detection arithmetic).
    bows = []
    for i in range(4):
        d = rng.integers(0, 2 ** 32, size=(500, 8), dtype=np.uint32)
        bows.append(voc.bow_vector(d, np.ones(500, bool)))
    t0 = time.perf_counter()
    s01 = Vocabulary.score(bows[0], bows[1])
    s_self = Vocabulary.score(bows[0], bows[0])
    out["score_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    out["score_self"] = round(float(s_self), 4)
    out["score_cross"] = round(float(s01), 6)
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else "/tmp/orbvoc_full.txt"
    k = 10
    L = 6
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            k = int(a.split("=")[1])
        if a.startswith("--L="):
            L = int(a.split("=")[1])
    if not os.path.exists(path):
        dt = generate(path, k=k, L=L)
        print(f"# generated {path} in {dt:.1f}s", file=sys.stderr)
    if "--bench" in sys.argv:
        print(json.dumps(bench(path), indent=2))


if __name__ == "__main__":
    main()
