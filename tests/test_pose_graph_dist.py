"""Sharded pose graph vs single-device: same drift-correction result."""

import numpy as np
import jax.numpy as jnp

from orb_slam_system_tpu.solvers.pose_graph import optimize_essential_graph
from orb_slam_system_tpu.utils import lie


def _make_problem(rng, K=12):
    def make_pose(k):
        ang = 2 * np.pi * k / K
        xi = np.array([0.5 * np.sin(ang), 0.0, 0.5 * (1 - np.cos(ang)),
                       0.0, ang, 0.0], np.float32)
        return np.asarray(lie.se3_exp(jnp.asarray(xi)))
    T_true = [make_pose(k) for k in range(K)]
    T_est = [T_true[0]]
    for k in range(1, K):
        rel = T_true[k] @ np.linalg.inv(T_true[k - 1])
        noise = np.asarray(lie.se3_exp(jnp.asarray(
            (rng.normal(size=6) * 0.02).astype(np.float32))))
        T_est.append(noise @ rel @ T_est[-1])
    R0 = np.stack([T[:3, :3] for T in T_est]).astype(np.float32)
    t0 = np.stack([T[:3, 3] for T in T_est]).astype(np.float32)
    s0 = np.ones(K, np.float32)
    e_i, e_j, e_R, e_t, e_s = [], [], [], [], []

    def add_edge(i, j, Ti, Tj):
        rel = Tj @ np.linalg.inv(Ti)
        e_i.append(i); e_j.append(j)
        e_R.append(rel[:3, :3]); e_t.append(rel[:3, 3]); e_s.append(1.0)

    for k in range(K - 1):
        add_edge(k, k + 1, T_est[k], T_est[k + 1])
    add_edge(K - 1, 0, T_true[K - 1], T_true[0])
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return (R0, t0, s0, fixed, np.ones(K, bool),
            np.asarray(e_i, np.int32), np.asarray(e_j, np.int32),
            np.stack(e_R).astype(np.float32), np.stack(e_t).astype(np.float32),
            np.asarray(e_s, np.float32), np.ones(len(e_i), bool))


def test_sharded_matches_single_device(rng):
    import jax
    from orb_slam_system_tpu.parallel.pose_graph_dist import (
        optimize_essential_graph_sharded)
    from jax.sharding import Mesh

    args = _make_problem(rng)
    R1, t1, s1 = optimize_essential_graph(
        *[jnp.asarray(a) for a in args], n_iters=15, cg_iters=40)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("graph",))
    R2, t2, s2 = optimize_essential_graph_sharded(
        mesh, *args, n_iters=15, cg_iters=40)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-3)


def test_bundle_adjust_cg_sharded_equals_single_device(rng):
    """Edge-sharded GBA == single-device GBA to float tolerance (the
    normal equations / Schur matvecs are psum'd over the mesh, so sharding
    may only change reduction order)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from orb_slam_system_tpu.parallel.ba_dist import bundle_adjust_cg_sharded
    from orb_slam_system_tpu.solvers.local_ba import (
        BAProblem, bundle_adjust_cg)

    C, P = 6, 60
    fx = fy = 300.0
    cx, cy = 160.0, 120.0
    world = rng.uniform(-2, 2, size=(P, 3)).astype(np.float32)
    world[:, 2] = rng.uniform(4, 8, size=P)
    Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    for c in range(C):
        Tcw[c, 0, 3] = -0.2 * c + (rng.normal() * 0.02 if c else 0.0)
    e_cam, e_pt, e_uv = [], [], []
    for c in range(C):
        Xc = world @ Tcw[c, :3, :3].T + Tcw[c, :3, 3]
        uv = Xc[:, :2] / Xc[:, 2:3] * [fx, fy] + [cx, cy]
        uv += rng.normal(scale=0.3, size=uv.shape)
        for p in range(P):
            e_cam.append(c)
            e_pt.append(p)
            e_uv.append(uv[p])
    E = len(e_cam)
    noisy = world + rng.normal(scale=0.03, size=world.shape).astype(
        np.float32)
    prob = BAProblem(
        Tcw=jnp.asarray(Tcw),
        cam_fixed=jnp.asarray(np.arange(C) == 0),
        cam_valid=jnp.asarray(np.ones(C, bool)),
        points=jnp.asarray(noisy), pt_valid=jnp.asarray(np.ones(P, bool)),
        e_cam=jnp.asarray(np.asarray(e_cam, np.int32)),
        e_pt=jnp.asarray(np.asarray(e_pt, np.int32)),
        e_uv=jnp.asarray(np.asarray(e_uv, np.float32)),
        e_inv_sigma2=jnp.asarray(np.ones(E, np.float32)),
        e_valid=jnp.asarray(np.ones(E, bool)))
    T1, X1 = bundle_adjust_cg(prob, fx, fy, cx, cy, n_iters=4, cg_iters=25)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("graph",))
    T8, X8 = bundle_adjust_cg_sharded(mesh, prob, fx, fy, cx, cy,
                                      n_iters=4, cg_iters=25)
    # f32 reduction-order drift accumulates over 4 LM x 25 CG iterations;
    # 1e-3 is far below any geometric significance here.
    np.testing.assert_allclose(np.asarray(T8), np.asarray(T1),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(X8), np.asarray(X1),
                               rtol=1e-3, atol=1e-3)
    # And it actually reduced the reprojection cost (the optimum under
    # observation noise is not ground truth, so gate on the objective).
    def rms(T, X):
        T = np.asarray(T); X = np.asarray(X)
        errs = []
        for k in range(E):
            c, p = e_cam[k], e_pt[k]
            Xc = T[c, :3, :3] @ X[p] + T[c, :3, 3]
            u = np.array([fx * Xc[0] / Xc[2] + cx, fy * Xc[1] / Xc[2] + cy])
            errs.append(np.sum((u - e_uv[k]) ** 2))
        return np.sqrt(np.mean(errs))
    assert rms(T8, X8) < 0.7 * rms(Tcw, noisy)
