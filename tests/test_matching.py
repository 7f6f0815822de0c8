import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.ops import matching
from orb_slam_system_tpu.ops.brief import pack_bits


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def flip_bits(rng, desc, n_bits):
    """Flip n_bits random bits of each packed descriptor row."""
    out = desc.copy()
    for i in range(out.shape[0]):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = np.uint32(1) << np.uint32(rng.integers(0, 32))
            out[i, w] ^= b
    return out


def test_search_for_initialization_basic(rng):
    N = 64
    desc1 = rand_desc(rng, N)
    perm = rng.permutation(N)
    desc2 = flip_bits(rng, desc1, 5)[perm]  # matched with ~<=5 bit noise
    xy1 = rng.uniform(50, 200, size=(N, 2)).astype(np.float32)
    xy2 = (xy1 + rng.normal(size=(N, 2)) * 10).astype(np.float32)[perm]
    valid = np.ones(N, bool)
    oct0 = np.zeros(N, np.int32)
    ang = np.full(N, 0.3, np.float32)
    res = matching.search_for_initialization(
        jnp.asarray(xy1), jnp.asarray(desc1), jnp.asarray(valid), jnp.asarray(oct0),
        jnp.asarray(ang),
        jnp.asarray(xy2), jnp.asarray(desc2), jnp.asarray(valid), jnp.asarray(oct0),
        jnp.asarray(ang),
        prev_matched_xy=jnp.asarray(xy1),
    )
    idx2 = np.asarray(res.idx2)
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)
    expected = inv  # row i of set1 should match row inv[i] of set2... wait
    # desc2[j] corresponds to desc1[perm[j]]; so set1 row i matches set2 row
    # where perm[j] == i -> j = argwhere(perm == i).
    j_of_i = np.empty(N, np.int64)
    j_of_i[perm] = np.arange(N)
    ok = idx2 == j_of_i
    assert ok.mean() > 0.9


def test_initialization_window_gating(rng):
    N = 32
    desc1 = rand_desc(rng, N)
    desc2 = desc1.copy()
    xy1 = rng.uniform(100, 200, size=(N, 2)).astype(np.float32)
    xy2 = xy1.copy()
    xy2[:10] += 300.0  # outside the 100px window
    valid = np.ones(N, bool)
    oct0 = np.zeros(N, np.int32)
    ang = np.zeros(N, np.float32)
    res = matching.search_for_initialization(
        jnp.asarray(xy1), jnp.asarray(desc1), jnp.asarray(valid), jnp.asarray(oct0),
        jnp.asarray(ang),
        jnp.asarray(xy2), jnp.asarray(desc2), jnp.asarray(valid), jnp.asarray(oct0),
        jnp.asarray(ang),
        prev_matched_xy=jnp.asarray(xy1),
    )
    idx2 = np.asarray(res.idx2)
    assert (idx2[:10] == -1).all()
    assert (idx2[10:] == np.arange(10, N)).all()


def test_rotation_consistency_filters_outliers(rng):
    N = 100
    matched = np.ones(N, bool)
    ang1 = rng.uniform(0, 2 * np.pi, size=N).astype(np.float32)
    ang2 = (ang1 - 0.5).astype(np.float32)  # consistent rotation of 0.5 rad
    # 10 inconsistent matches.
    ang2[:10] = rng.uniform(0, 2 * np.pi, size=10)
    out = np.asarray(
        matching.rotation_consistency(
            jnp.asarray(ang1), jnp.asarray(ang2), jnp.asarray(matched)))
    assert out[10:].mean() > 0.9
    assert out[:10].mean() < 0.4


def test_search_by_projection_motion(rng):
    N = 48
    desc_prev = rand_desc(rng, N)
    desc2 = flip_bits(rng, desc_prev, 3)
    proj = rng.uniform(50, 250, size=(N, 2)).astype(np.float32)
    xy2 = (proj + rng.normal(size=(N, 2)) * 2).astype(np.float32)
    radius = np.full(N, 7.0, np.float32)
    oct_ = np.zeros(N, np.int32)
    ang = np.zeros(N, np.float32)
    valid = np.ones(N, bool)
    res = matching.search_by_projection_motion(
        jnp.asarray(proj), jnp.asarray(radius), jnp.asarray(valid),
        jnp.asarray(desc_prev), jnp.asarray(oct_), jnp.asarray(ang),
        jnp.asarray(xy2), jnp.asarray(desc2), jnp.asarray(valid),
        jnp.asarray(oct_), jnp.asarray(ang))
    idx2 = np.asarray(res.idx2)
    assert (idx2 == np.arange(N)).mean() > 0.9


def test_search_by_node_id(rng):
    N = 40
    desc1 = rand_desc(rng, N)
    desc2 = flip_bits(rng, desc1, 2)
    nodes = rng.integers(0, 5, size=N).astype(np.int32)
    valid = np.ones(N, bool)
    ang = np.zeros(N, np.float32)
    res = matching.search_by_node_id(
        jnp.asarray(desc1), jnp.asarray(valid), jnp.asarray(ang), jnp.asarray(nodes),
        jnp.asarray(desc2), jnp.asarray(valid), jnp.asarray(ang), jnp.asarray(nodes))
    idx2 = np.asarray(res.idx2)
    assert (idx2 == np.arange(N)).mean() > 0.85
    # Different node ids -> no matches at all.
    nodes2 = nodes + 100
    res2 = matching.search_by_node_id(
        jnp.asarray(desc1), jnp.asarray(valid), jnp.asarray(ang), jnp.asarray(nodes),
        jnp.asarray(desc2), jnp.asarray(valid), jnp.asarray(ang), jnp.asarray(nodes2))
    assert (np.asarray(res2.idx2) == -1).all()


def test_one_to_one_dedup(rng):
    # Two set-1 descriptors identical -> both point at the same set-2 target;
    # only the better (or first) one may keep it.
    desc1 = rand_desc(rng, 4)
    desc1[1] = desc1[0]
    desc2 = desc1[[0, 2, 3]].copy()
    desc2 = np.concatenate([desc2, rand_desc(rng, 1)], axis=0)
    xy = np.zeros((4, 2), np.float32)
    valid = np.ones(4, bool)
    oct0 = np.zeros(4, np.int32)
    ang = np.zeros(4, np.float32)
    res = matching.search_for_initialization(
        jnp.asarray(xy), jnp.asarray(desc1), jnp.asarray(valid), jnp.asarray(oct0),
        jnp.asarray(ang),
        jnp.asarray(xy), jnp.asarray(desc2), jnp.asarray(valid), jnp.asarray(oct0),
        jnp.asarray(ang),
        prev_matched_xy=jnp.asarray(xy),
    )
    idx2 = np.asarray(res.idx2)
    claimed = idx2[idx2 >= 0]
    assert len(claimed) == len(set(claimed.tolist()))  # one-to-one
