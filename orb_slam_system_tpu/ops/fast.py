"""FAST corner detection, NMS, and spatially-uniform keypoint selection.

Replaces reference ORBextractor::ComputeKeyPointsOctTree +
DistributeOctTree (src/ORBextractor.cc:228-357): 30px-cell FAST with
ini/min thresholds (20 -> 7 fallback per cell) and quad-tree culling to
per-level budgets.

TPU design (SURVEY.md §7.1):
  * The 16-pixel Bresenham circle test is evaluated densely for the whole
    image as vectorized VPU ops (16 shifted views, circular windowed min via
    log-step reductions) — no scalar loops, no data-dependent shapes.
  * The per-pixel *score* is the exact FAST-9 corner threshold: the largest t
    for which the pixel is still a corner. One dense score map serves both
    thresholds (corner@t <=> score > t) and NMS, replacing the reference's
    two-pass 20-then-7 refire (src/ORBextractor.cc:288-357).
  * Quad-tree culling is replaced by per-cell ranking: top-K per grid cell,
    then a global top-N where candidates are ordered first by their rank
    inside the cell and then by score. With enough cells this selects the
    best corner of N distinct cells — the same spatial-uniformity contract as
    DistributeOctTree (<= N best-response keypoints, spread out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3: 16 (dy, dx) offsets in circular order
# (same circle OpenCV's FAST_9_16 uses).
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # FAST-9: contiguous arc of >= 9 circle pixels


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift img[B,H,W] so out[y,x] = img[y+dy, x+dx]; border values are
    garbage (wrapped) and get masked by the border margin later."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(1, 2))


def fast_score_map(img: jnp.ndarray, border: int) -> jnp.ndarray:
    """Dense FAST-9 corner score. img: f32[B,H,W] -> score f32[B,H,W].

    score(p) = max over the 32 (16 bright + 16 dark) circular arcs of length 9
    of the min ring-vs-center difference; p is a corner at threshold t iff
    score(p) > t. Border pixels (within `border` of the edge) score 0.
    """
    B, H, W = img.shape
    diffs = jnp.stack([_shift2d(img, int(dy), int(dx)) for dy, dx in CIRCLE], axis=0)
    bright = diffs - img[None]          # ring brighter than center
    dark = -bright                      # ring darker than center
    min_b = _partial_min_window(bright, ARC_LEN)
    min_d = _partial_min_window(dark, ARC_LEN)
    score = jnp.maximum(jnp.max(min_b, axis=0), jnp.max(min_d, axis=0))
    # Mask borders.
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inb = (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )
    return jnp.where(inb[None], score, 0.0)


def _partial_min_window(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Circular min over windows [i, i+win) along axis 0 (len 16), by
    log-step doubling: out_k(i) = min x[i : i+2^k], then fold the remainder."""
    out = x
    done = 1
    while done * 2 <= win:
        out = jnp.minimum(out, jnp.roll(out, -done, axis=0))
        done *= 2
    # Fold remaining elements one roll of the partial at a time.
    rem = win - done
    off = done
    while rem > 0:
        step = min(done, rem)
        # min over [i+off, i+off+step) equals partial-of-size-`step` at i+off;
        # reuse `x` doubling partials by recomputing (cheap: <=4 ops total).
        part = x
        d = 1
        while d < step:
            part = jnp.minimum(part, jnp.roll(part, -d, axis=0))
            d *= 2
        out = jnp.minimum(out, jnp.roll(part, -off, axis=0))
        off += step
        rem -= step
    return out


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression: keep pixels equal to their neighborhood
    max. score: f32[B,H,W] -> suppressed score (0 where not a local max)."""
    pooled = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    # Tie-break toward earlier (row-major) pixel: strictly-greater neighbors
    # suppress; equal neighbors keep both (rare for float scores).
    return jnp.where(score >= pooled, score, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("n_max", "cell", "topk_per_cell", "border", "pre_nms"),
)
def select_keypoints(
    score: jnp.ndarray,
    n_max: int,
    ini_th: float,
    min_th: float,
    cell: int = 16,
    topk_per_cell: int = 4,
    border: int = 19,
    pre_nms: bool = False,
):
    """Spatially-uniform top-n_max keypoint selection from a dense score map.

    Implements the contract of ComputeKeyPointsOctTree+DistributeOctTree
    (src/ORBextractor.cc:228-357): per-cell FAST with min-threshold fallback
    only in cells lacking a strong (>ini_th) corner, then budget-limited
    selection that prefers covering distinct cells (uniformity) and breaks
    ties by response.

    Returns (xy i32[B, n_max, 2] as (x, y), response f32[B, n_max],
    valid bool[B, n_max]).
    """
    B, H, W = score.shape
    s = score if pre_nms else nms3x3(score)
    # Threshold logic: weak corners only count in cells with no strong corner.
    Hp = ((H + cell - 1) // cell) * cell
    Wp = ((W + cell - 1) // cell) * cell
    s = jnp.pad(s, ((0, 0), (0, Hp - H), (0, Wp - W)))
    hc, wc = Hp // cell, Wp // cell
    cells = s.reshape(B, hc, cell, wc, cell).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(B, hc * wc, cell * cell)
    cell_max = jnp.max(cells, axis=-1, keepdims=True)
    has_strong = cell_max > ini_th
    eligible = jnp.where(has_strong, cells > ini_th, cells > min_th)
    cells = jnp.where(eligible, cells, 0.0)
    # Per-cell top-K by K iterative max+mask passes: lax.top_k sorts each
    # 256-element cell (the extractor's single hottest op on TPU); K cheap
    # VPU max-reductions find the same K best responses.
    vals_l, idx_l = [], []
    remaining = cells
    pos = jnp.arange(cells.shape[-1], dtype=jnp.int32)
    for _ in range(topk_per_cell):
        m = jnp.max(remaining, axis=-1)                      # [B, C]
        is_m = remaining == m[..., None]
        # Lowest index among ties (top_k tie-breaking order).
        am = jnp.min(jnp.where(is_m, pos, 1 << 20), axis=-1)
        vals_l.append(m)
        idx_l.append(am.astype(jnp.int32))
        remaining = jnp.where(pos[None, None, :] == am[..., None],
                              -jnp.inf, remaining)
    vals = jnp.stack(vals_l, axis=-1)                        # [B, C, K]
    idx = jnp.stack(idx_l, axis=-1)
    # Global candidate ordering: cover cells first (rank 0 of every cell),
    # then rank 1, etc.; inside a rank order by response.
    rank = jnp.arange(topk_per_cell, dtype=jnp.float32)[None, None, :]
    smax = jnp.max(vals) + 1.0
    order_key = jnp.where(vals > 0.0, -rank * smax + vals, -jnp.inf)
    flat_key = order_key.reshape(B, -1)
    top_vals, flat_idx = jax.lax.top_k(flat_key, n_max)  # over C*K
    cell_idx = flat_idx // topk_per_cell
    k_idx = flat_idx % topk_per_cell
    in_cell = jnp.take_along_axis(
        idx.reshape(B, -1), cell_idx * topk_per_cell + k_idx, axis=1
    )
    resp = jnp.take_along_axis(vals.reshape(B, -1), cell_idx * topk_per_cell + k_idx, axis=1)
    cy = cell_idx // wc
    cx = cell_idx % wc
    py = cy * cell + in_cell // cell
    px = cx * cell + in_cell % cell
    valid = (resp > 0.0) & jnp.isfinite(top_vals)
    xy = jnp.stack([px, py], axis=-1).astype(jnp.int32)
    xy = jnp.where(valid[..., None], xy, 0)
    return xy, resp, valid
