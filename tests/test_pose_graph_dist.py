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
