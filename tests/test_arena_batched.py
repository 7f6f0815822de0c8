"""Batched arena refresh passes match the per-point reference routines.

compute_distinctive_many / vectorized update_normals_many replace per-point
Python loops on the keyframe-insertion hot path (reference MapPoint::
ComputeDistinctiveDescriptors src/MapPoint.cc:222-278 and
UpdateNormalAndDepth :301-351); these tests pin batched == per-point on
randomized ragged observation sets.
"""

import numpy as np

from orb_slam_system_tpu.mapping.arena import FrameFeatures, MapArena


def _feats(rng, n=32):
    return FrameFeatures(
        xy=rng.uniform(0, 640, (n, 2)).astype(np.float32),
        xy_und=rng.uniform(0, 640, (n, 2)).astype(np.float32),
        response=rng.uniform(0, 50, n).astype(np.float32),
        angle=rng.uniform(0, 360, n).astype(np.float32),
        octave=rng.integers(0, 8, n).astype(np.int32),
        desc=rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32),
        valid=np.ones(n, bool),
    )


def _random_map(seed=0, n_kfs=6, n_pts=40):
    rng = np.random.default_rng(seed)
    arena = MapArena()
    kfs = []
    for k in range(n_kfs):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(0, 1.0, 3)
        kfs.append(arena.new_keyframe(k, k / 30.0, T, _feats(rng)))
    mps = []
    for _ in range(n_pts):
        pos = rng.normal(0, 2.0, 3) + [0, 0, 5]
        mp = arena.new_point(pos, rng.integers(0, 2 ** 32, 8,
                                               dtype=np.uint32), 0, 0)
        n_obs = int(rng.integers(1, n_kfs + 1))
        for kf in rng.permutation(kfs)[:n_obs]:
            arena.add_observation(mp, kf, int(rng.integers(0, 32)))
        mp.ref_kf = next(iter(mp.obs))
        mps.append(mp)
    return arena, mps


def test_compute_distinctive_many_matches_per_point():
    arena, mps = _random_map(seed=1)
    expected = []
    for mp in mps:
        arena.compute_distinctive_descriptor(mp)
        expected.append(mp.desc.copy())
        mp.desc = np.zeros(8, np.uint32)
    arena.compute_distinctive_many(mps)
    for mp, exp in zip(mps, expected):
        np.testing.assert_array_equal(mp.desc, exp)


def test_compute_distinctive_many_with_dead_keyframes():
    arena, mps = _random_map(seed=2)
    arena.kfs[2].bad = True                 # dead observations are skipped
    del arena.kfs[3]
    expected = []
    for mp in mps:
        arena.compute_distinctive_descriptor(mp)
        expected.append(mp.desc.copy())
    arena.compute_distinctive_many(mps)
    for mp, exp in zip(mps, expected):
        np.testing.assert_array_equal(mp.desc, exp)


def test_update_normals_many_matches_per_point():
    arena, mps = _random_map(seed=3)
    scale_factors = (1.2 ** np.arange(8)).astype(np.float32)
    expected = []
    for mp in mps:
        arena.update_normal_and_depth(mp, scale_factors)
        expected.append((mp.normal.copy(), mp.min_dist, mp.max_dist))
        mp.normal = np.zeros(3, np.float32)
        mp.min_dist = mp.max_dist = -1.0
    arena.update_normals_many(mps, scale_factors)
    for mp, (n, mind, maxd) in zip(mps, expected):
        np.testing.assert_allclose(mp.normal, n, atol=1e-6)
        assert abs(mp.min_dist - mind) < 1e-5 * max(1.0, abs(mind))
        assert abs(mp.max_dist - maxd) < 1e-5 * max(1.0, abs(maxd))


def test_update_normals_many_missing_ref_kf():
    arena, mps = _random_map(seed=4)
    scale_factors = (1.2 ** np.arange(8)).astype(np.float32)
    # Kill one point's ref keyframe: band must stay untouched, normal still
    # averages the remaining alive observations (per-point semantics).
    victim = next(mp for mp in mps if len(mp.obs) >= 2)
    dead_ref = victim.ref_kf
    del arena.kfs[dead_ref]
    for mp in mps:
        arena.update_normal_and_depth(mp, scale_factors)
    expected = [(mp.normal.copy(), mp.min_dist, mp.max_dist) for mp in mps]
    arena.update_normals_many(mps, scale_factors)
    for mp, (n, mind, maxd) in zip(mps, expected):
        np.testing.assert_allclose(mp.normal, n, atol=1e-6)
        assert abs(mp.min_dist - mind) < 1e-5 * max(1.0, abs(mind))
        assert abs(mp.max_dist - maxd) < 1e-5 * max(1.0, abs(maxd))
