import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_system_tpu.solvers.initializer import (
    initialize_two_view,
    make_ransac_sets,
)
from orb_slam_system_tpu.solvers.pose_opt import pose_optimization
from orb_slam_system_tpu.solvers.triangulate import triangulate_dlt
from orb_slam_system_tpu.utils import lie

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def project(X, R, t):
    Xc = X @ R.T + t
    return (Xc[:, :2] / Xc[:, 2:3]) * [FX, FY] + [CX, CY], Xc[:, 2]


def random_pose(rng, rot_scale=0.1, t_scale=0.5):
    w = rng.normal(size=3) * rot_scale
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = rng.normal(size=3) * t_scale
    return R.astype(np.float32), t.astype(np.float32)


def test_triangulate_exact(rng):
    X = rng.uniform(-2, 2, size=(64, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 8, size=64)
    R, t = random_pose(rng)
    uv1, _ = project(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    uv2, _ = project(X, R, t)
    P1 = np.concatenate([K, np.zeros((3, 1), np.float32)], axis=1)
    P2 = K @ np.concatenate([R, t[:, None]], axis=1)
    Xr, ok = triangulate_dlt(jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(P1), jnp.asarray(P2))
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(Xr), X, atol=5e-2)


def test_pose_optimization_converges(rng):
    N = 256
    X = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 10, size=N)
    R, t = random_pose(rng, 0.2, 0.5)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R
    T_true[:3, 3] = t
    uv, z = project(X, R, t)
    assert (z > 0).all()
    # Perturb the initial pose.
    dxi = (rng.normal(size=6) * 0.05).astype(np.float32)
    T0 = np.asarray(lie.se3_exp(jnp.asarray(dxi))) @ T_true
    inv_sigma2 = np.ones(N, np.float32)
    valid = np.ones(N, bool)
    T_opt, inlier, n_in = pose_optimization(
        jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uv),
        jnp.asarray(inv_sigma2), jnp.asarray(valid), FX, FY, CX, CY)
    T_opt = np.asarray(T_opt)
    assert int(n_in) > 0.95 * N
    np.testing.assert_allclose(T_opt, T_true, atol=1e-3)


def test_pose_optimization_rejects_outliers(rng):
    N = 256
    X = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 10, size=N)
    R, t = random_pose(rng, 0.15, 0.4)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, :3] = R
    T_true[:3, 3] = t
    uv, _ = project(X, R, t)
    uv += rng.normal(size=uv.shape).astype(np.float32) * 0.5  # 0.5px noise
    # 20% gross outliers.
    n_out = N // 5
    out_idx = rng.choice(N, size=n_out, replace=False)
    uv[out_idx] += rng.uniform(30, 120, size=(n_out, 2)).astype(np.float32)
    dxi = (rng.normal(size=6) * 0.03).astype(np.float32)
    T0 = np.asarray(lie.se3_exp(jnp.asarray(dxi))) @ T_true
    T_opt, inlier, n_in = pose_optimization(
        jnp.asarray(T0), jnp.asarray(X), jnp.asarray(uv.astype(np.float32)),
        jnp.asarray(np.ones(N, np.float32)), jnp.asarray(np.ones(N, bool)),
        FX, FY, CX, CY)
    inlier = np.asarray(inlier)
    # Outliers excluded, most inliers kept.
    assert not inlier[out_idx].any()
    assert inlier.sum() > 0.85 * (N - n_out)
    # Rotation error small.
    R_opt = np.asarray(T_opt)[:3, :3]
    err = np.degrees(np.arccos(np.clip((np.trace(R_opt @ R.T) - 1) / 2, -1, 1)))
    assert err < 0.2


def _run_init(X, R, t, rng, noise=0.3):
    M = X.shape[0]
    uv1, z1 = project(X, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    uv2, z2 = project(X, R, t)
    assert (z1 > 0).all() and (z2 > 0).all()
    uv1 = uv1 + rng.normal(size=uv1.shape) * noise
    uv2 = uv2 + rng.normal(size=uv2.shape) * noise
    # Pad to 256 slots.
    P = 256
    pts1 = np.zeros((P, 2), np.float32)
    pts2 = np.zeros((P, 2), np.float32)
    valid = np.zeros(P, bool)
    pts1[:M] = uv1
    pts2[:M] = uv2
    valid[:M] = True
    sets = make_ransac_sets(P, 200, 8, seed=0)
    return initialize_two_view(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(valid),
        jnp.asarray(sets), jnp.asarray(K))


def _pose_errors(res, R, t):
    R21 = np.asarray(res.R21)
    t21 = np.asarray(res.t21)
    rot_err = np.degrees(
        np.arccos(np.clip((np.trace(R21 @ R.T) - 1) / 2, -1, 1)))
    t_dir = t / np.linalg.norm(t)
    t_err = np.degrees(
        np.arccos(np.clip(abs(float(t21 @ t_dir)), -1, 1)))
    return rot_err, t_err


def test_initializer_general_scene_uses_f(rng):
    M = 150
    X = rng.uniform(-3, 3, size=(M, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 12, size=M)
    R, t = random_pose(rng, 0.05, 1.0)
    t[2] *= 0.1  # mostly lateral baseline
    res = _run_init(X, R, t, rng)
    assert bool(res.success)
    rot_err, t_err = _pose_errors(res, R, t)
    assert rot_err < 0.5
    assert t_err < 2.0
    assert int(res.n_good) > 100


def test_initializer_planar_scene_uses_h(rng):
    # Quasi-planar scene: dominant tilted plane plus some off-plane points.
    # (Exactly coplanar points admit two physically valid decompositions —
    # the classic two-view planar ambiguity — which the 0.75 second-best
    # gate correctly rejects; real scenes always carry off-plane structure.)
    M = 150
    X = np.zeros((M, 3), np.float32)
    X[:, 0] = rng.uniform(-3, 3, size=M)
    X[:, 1] = rng.uniform(-2.2, 2.2, size=M)
    X[:, 2] = 6.0 + 0.6 * X[:, 0] + 0.3 * X[:, 1]
    X[120:, 2] += rng.uniform(0.5, 1.5, size=30)  # 20% off-plane
    R, t = random_pose(rng, 0.04, 1.0)
    res = _run_init(X, R, t, rng)
    assert bool(res.success)
    assert bool(res.used_homography)
    rot_err, t_err = _pose_errors(res, R, t)
    assert rot_err < 0.5
    assert t_err < 3.0


def test_initializer_rejects_pure_rotation(rng):
    # No baseline -> no parallax -> must not succeed.
    M = 150
    X = rng.uniform(-3, 3, size=(M, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 12, size=M)
    R, _ = random_pose(rng, 0.05, 0.0)
    t = np.zeros(3, np.float32)
    res = _run_init(X, R, t, rng, noise=0.3)
    assert not bool(res.success)
