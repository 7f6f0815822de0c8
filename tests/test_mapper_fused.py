"""Fused tri+fuse keyframe-insertion program (ops/mapper_fused.py).

Parity between the ONE-fetch fused device path and the classic two-stage
path (create_new_map_points + search_in_neighbors): same reference
semantics (LocalMapping.cc:166-293), so a full synthetic run must land in
the same quality envelope with a comparable map.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_tri_fuse_step_shapes():
    """Smoke: compile both chained programs at tiny shapes and check the
    packed layout."""
    import jax.numpy as jnp
    from orb_slam_system_tpu.ops import mapper_fused

    rng = np.random.default_rng(0)
    N1, M, T, PB, N2 = 16, 8, 8, 8, 16
    L = 4
    f = lambda *s: jnp.asarray(  # noqa: E731
        rng.normal(size=s).astype(np.float32))
    d = lambda *s: jnp.asarray(  # noqa: E731
        rng.integers(0, 2**32, size=s, dtype=np.uint32))
    b = lambda *s: jnp.asarray(np.ones(s, bool))  # noqa: E731
    o = lambda *s: jnp.asarray(  # noqa: E731
        rng.integers(0, L, size=s).astype(np.int32))
    sf = jnp.asarray((1.2 ** np.arange(L)).astype(np.float32))
    is2 = jnp.asarray((1.0 / sf ** 2).astype(np.float32))
    xy1, desc1, oct1 = f(N1, 2) * 100, d(N1, 8), o(N1)
    Tcw1 = jnp.asarray(np.eye(4, dtype=np.float32))
    O1 = jnp.asarray(np.zeros(3, np.float32))
    nb_O = f(M, 3)
    tri_args = (
        xy1, desc1, b(N1), oct1, f(N1),
        f(M, N2, 2) * 100, d(M, N2, 8), b(M, N2), o(M, N2), f(M, N2),
        f(M, 3, 3), f(M, 2), b(M),
        jnp.asarray(np.eye(3, 4, dtype=np.float32)),
        jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32), (M, 1, 1))),
        Tcw1, jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))),
        O1, nb_O,
        jnp.asarray(np.eye(3, dtype=np.float32)),
        100.0, 100.0, 80.0, 60.0,
        is2, sf, 1.8,
    )
    tri = mapper_fused.tri_step(*tri_args)
    assert tri.shape == (N1, 6)
    fuse_args = (
        xy1, desc1, b(N1), oct1, Tcw1, O1, nb_O,
        100.0, 100.0, 80.0, 60.0, 160.0, 120.0,
        sf, float(np.log(1.2)),
        f(T, N2, 2) * 100, d(T, N2, 8), b(T, N2), o(T, N2),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (T, 1, 1))),
        f(T, 3), f(T, 3), b(T),
        f(N1, 3), d(N1, 8), jnp.asarray(np.zeros(N1, np.float32)),
        jnp.asarray(np.full(N1, 10.0, np.float32)), f(N1, 3), b(N1),
        f(PB, 3), d(PB, 8), jnp.asarray(np.zeros(PB, np.float32)),
        jnp.asarray(np.full(PB, 10.0, np.float32)), f(PB, 3), b(PB),
    )
    out = np.asarray(mapper_fused.fuse_step(tri, *fuse_args))
    assert out.shape == (N1 * 6 + T * 2 * N1 + PB,)
    tri_h, idxA, idxB = mapper_fused.unpack_tri_fuse(
        out, N1, T, 2 * N1, PB, True)
    assert tri_h.shape == (N1, 6)
    np.testing.assert_allclose(tri_h, np.asarray(tri))
    assert idxA.shape == (T, 2 * N1)
    assert idxB.shape == (PB,)


@pytest.fixture(scope="module")
def parity_runs(tmp_path_factory):
    from examples.mono_synthetic import run

    out1 = tmp_path_factory.mktemp("fused")
    s_fused, r_fused = run(n_frames=18, out_dir=str(out1), verbose=False,
                           n_features=400)
    os.environ["ORB_SLAM_TPU_NO_FUSED_TRI"] = "1"
    try:
        out2 = tmp_path_factory.mktemp("classic")
        s_classic, r_classic = run(n_frames=18, out_dir=str(out2),
                                   verbose=False, n_features=400)
    finally:
        os.environ.pop("ORB_SLAM_TPU_NO_FUSED_TRI", None)
    return s_fused, r_fused, s_classic, r_classic


def test_fused_classic_parity(parity_runs):
    s_fused, r_fused, s_classic, r_classic = parity_runs
    assert s_fused.local_mapper.use_fused_tri
    assert not s_classic.local_mapper.use_fused_tri
    # Both land cm-class on the easy arc.
    assert r_fused < 0.03 and r_classic < 0.03
    # Comparable map: same keyframe count ballpark, point count within 15%.
    nk_f, nk_c = s_fused.arena.n_keyframes(), s_classic.arena.n_keyframes()
    np_f, np_c = s_fused.arena.n_points(), s_classic.arena.n_points()
    assert abs(nk_f - nk_c) <= 2
    assert abs(np_f - np_c) <= 0.15 * max(np_f, np_c)


def test_fused_map_integrity(parity_runs):
    s_fused = parity_runs[0]
    for mp in s_fused.arena.mps.values():
        assert not mp.bad
        assert len(mp.obs) >= 1
        for kf_id, idx in mp.obs.items():
            kf = s_fused.arena.kfs.get(kf_id)
            if kf is not None:
                assert kf.mp_ids[idx] == mp.id
        assert mp.max_dist >= mp.min_dist >= 0
