import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.solvers.pose_graph import (
    optimize_essential_graph,
    optimize_sim3,
)
from orb_slam_system_tpu.solvers.sim3 import (
    horn_sim3,
    make_sim3_sample_sets,
    sim3_ransac,
)
from orb_slam_system_tpu.utils import lie

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def test_horn_sim3_exact(rng):
    N = 32
    P2 = rng.uniform(-2, 2, size=(N, 3)).astype(np.float32)
    w = rng.normal(size=3) * 0.4
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = rng.normal(size=3).astype(np.float32)
    s = 1.7
    P1 = s * (P2 @ R.T) + t
    s_e, R_e, t_e = horn_sim3(jnp.asarray(P1), jnp.asarray(P2),
                              jnp.ones(N), False)
    assert abs(float(s_e) - s) < 1e-3
    np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-3)


def test_sim3_ransac_with_outliers(rng):
    N = 64
    # Points in KF2's camera frame, in front of the camera.
    P2 = rng.uniform(-2, 2, size=(N, 3)).astype(np.float32)
    P2[:, 2] = rng.uniform(4, 8, size=N)
    w = rng.normal(size=3) * 0.1
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = np.array([0.4, -0.2, 0.3], np.float32)
    s = 1.3
    P1 = s * (P2 @ R.T) + t
    uv1 = (P1[:, :2] / P1[:, 2:3]) * [FX, FY] + [CX, CY]
    uv2 = (P2[:, :2] / P2[:, 2:3]) * [FX, FY] + [CX, CY]
    # 25% outlier correspondences: scramble P2 rows.
    n_out = 16
    idx = rng.choice(N, size=n_out, replace=False)
    P2o = P2.copy()
    P2o[idx] = P2o[idx][::-1] + rng.normal(size=(n_out, 3))
    sets = make_sim3_sample_sets(N, 300, 0)
    ok, s_e, R_e, t_e, inl, n = sim3_ransac(
        jnp.asarray(P1), jnp.asarray(P2o), jnp.asarray(uv1.astype(np.float32)),
        jnp.asarray(uv2.astype(np.float32)),
        jnp.full(N, 9.21, jnp.float32), jnp.full(N, 9.21, jnp.float32),
        jnp.ones(N, bool), jnp.asarray(sets), FX, FY, CX, CY)
    assert bool(ok)
    assert abs(float(s_e) - s) < 0.02
    np.testing.assert_allclose(np.asarray(R_e), R, atol=5e-3)
    assert int(n) >= N - n_out - 5


def test_optimize_sim3_refines(rng):
    N = 48
    P2 = rng.uniform(-2, 2, size=(N, 3)).astype(np.float32)
    P2[:, 2] = rng.uniform(4, 8, size=N)
    w = rng.normal(size=3) * 0.1
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = np.array([0.3, 0.1, -0.2], np.float32)
    s = 0.8
    P1 = s * (P2 @ R.T) + t
    uv1 = ((P1[:, :2] / P1[:, 2:3]) * [FX, FY] + [CX, CY]).astype(np.float32)
    uv2 = ((P2[:, :2] / P2[:, 2:3]) * [FX, FY] + [CX, CY]).astype(np.float32)
    # Perturbed initial guess.
    dxi = np.concatenate([rng.normal(size=6) * 0.02, [0.05]]).astype(np.float32)
    S_pert = lie.sim3_mul(lie.sim3_exp(jnp.asarray(dxi)),
                          {"R": jnp.asarray(R), "t": jnp.asarray(t),
                           "s": jnp.asarray(s, jnp.float32)})
    n_in, s_e, R_e, t_e, inl = optimize_sim3(
        S_pert["s"], S_pert["R"], S_pert["t"],
        jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(N), jnp.ones(N), jnp.ones(N, bool), FX, FY, CX, CY)
    assert int(n_in) > 0.9 * N
    assert abs(float(s_e) - s) < 0.01
    np.testing.assert_allclose(np.asarray(R_e), R, atol=2e-3)


def test_essential_graph_corrects_drift(rng):
    """Classic loop-closure setup: a chain of keyframes with accumulated
    drift; odometry edges keep consecutive poses, one loop edge pins the
    last keyframe to the first. After optimization the loop must close."""
    K = 12
    # Ground-truth poses on a circle (world->cam), identity scale.
    def make_pose(k):
        ang = 2 * np.pi * k / K
        xi = np.array([0.5 * np.sin(ang), 0.0, 0.5 * (1 - np.cos(ang)),
                       0.0, ang, 0.0], np.float32)
        return np.asarray(lie.se3_exp(jnp.asarray(xi)))
    T_true = [make_pose(k) for k in range(K)]
    # Drifted estimates: accumulate noisy relative transforms.
    T_est = [T_true[0]]
    for k in range(1, K):
        rel = T_true[k] @ np.linalg.inv(T_true[k - 1])
        noise = np.asarray(lie.se3_exp(jnp.asarray(
            (rng.normal(size=6) * 0.02).astype(np.float32))))
        T_est.append(noise @ rel @ T_est[-1])
    R0 = np.stack([T[:3, :3] for T in T_est]).astype(np.float32)
    t0 = np.stack([T[:3, 3] for T in T_est]).astype(np.float32)
    s0 = np.ones(K, np.float32)
    # Edges: consecutive (measured from the DRIFTED relative transforms =
    # consistent with current estimates) + loop edge K-1 -> 0 measured from
    # ground truth (the loop detector's Sim3).
    e_i, e_j, e_R, e_t, e_s = [], [], [], [], []
    def add_edge(i, j, Ti, Tj):
        # Sji maps vertex-i camera frame to vertex-j: S_j * S_i^-1.
        rel = Tj @ np.linalg.inv(Ti)
        e_i.append(i); e_j.append(j)
        e_R.append(rel[:3, :3]); e_t.append(rel[:3, 3]); e_s.append(1.0)
    for k in range(K - 1):
        add_edge(k, k + 1, T_est[k], T_est[k + 1])
    add_edge(K - 1, 0, T_true[K - 1], T_true[0])  # loop edge (true relative)
    E = len(e_i)
    fixed = np.zeros(K, bool); fixed[0] = True
    Rn, tn, sn = optimize_essential_graph(
        jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(s0),
        jnp.asarray(fixed), jnp.asarray(np.ones(K, bool)),
        jnp.asarray(np.asarray(e_i, np.int32)),
        jnp.asarray(np.asarray(e_j, np.int32)),
        jnp.asarray(np.stack(e_R).astype(np.float32)),
        jnp.asarray(np.stack(e_t).astype(np.float32)),
        jnp.asarray(np.asarray(e_s, np.float32)),
        jnp.asarray(np.ones(E, bool)),
        n_iters=20, cg_iters=40)
    # Loop closure error before vs after: || T_est[K-1] T_est[0]^-1 - true ||
    def loop_err(R_all, t_all):
        T_last = np.eye(4); T_last[:3, :3] = np.asarray(R_all[K-1]); T_last[:3, 3] = np.asarray(t_all[K-1])
        T_first = np.eye(4); T_first[:3, :3] = np.asarray(R_all[0]); T_first[:3, 3] = np.asarray(t_all[0])
        rel = T_last @ np.linalg.inv(T_first)
        rel_true = T_true[K-1] @ np.linalg.inv(T_true[0])
        return np.abs(rel - rel_true).max()
    err_before = loop_err(R0, t0)
    err_after = loop_err(np.asarray(Rn), np.asarray(tn))
    assert err_after < 0.3 * err_before
    # Scales stay near 1 for an SE3-consistent problem.
    assert np.abs(np.asarray(sn) - 1.0).max() < 0.05
    # Fixed vertex untouched.
    np.testing.assert_allclose(np.asarray(Rn)[0], R0[0], atol=1e-6)
