import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.solvers.pnp import epnp_ransac, make_pnp_sample_sets
from orb_slam_system_tpu.utils import lie

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def make_case(rng, N=128, n_out=0, noise=0.3):
    X = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(4, 10, size=N)
    w = rng.normal(size=3) * 0.3
    R = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    t = rng.normal(size=3).astype(np.float32) * 0.5
    Xc = X @ R.T + t
    Xc[:, 2] = np.abs(Xc[:, 2]) + 3.0  # keep in front
    # Recompute world points so projection is consistent.
    X = (Xc - t) @ np.linalg.inv(R).T
    uv = (Xc[:, :2] / Xc[:, 2:3]) * [FX, FY] + [CX, CY]
    uv += rng.normal(size=uv.shape) * noise
    if n_out:
        idx = rng.choice(N, size=n_out, replace=False)
        uv[idx] += rng.uniform(40, 120, size=(n_out, 2))
    return X.astype(np.float32), uv.astype(np.float32), R, t


def _solve(X, uv, rng):
    N = X.shape[0]
    sets = make_pnp_sample_sets(N, 300, seed=0)
    return epnp_ransac(
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(np.ones(N, np.float32)),
        jnp.asarray(np.ones(N, bool)), jnp.asarray(sets), FX, FY, CX, CY)


def test_epnp_clean(rng):
    X, uv, R, t = make_case(rng)
    ok, T, inl, n = _solve(X, uv, rng)
    assert bool(ok)
    T = np.asarray(T)
    rot_err = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3] @ R.T) - 1) / 2, -1, 1)))
    assert rot_err < 0.3
    # EPnP precision pre-LM-polish (~2cm); relocalization always follows
    # with pose_optimization, matching the reference flow.
    assert np.linalg.norm(T[:3, 3] - t) < 0.05
    assert int(n) > 0.85 * X.shape[0]


def test_epnp_with_outliers(rng):
    X, uv, R, t = make_case(rng, n_out=40)
    ok, T, inl, n = _solve(X, uv, rng)
    assert bool(ok)
    T = np.asarray(T)
    rot_err = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3] @ R.T) - 1) / 2, -1, 1)))
    assert rot_err < 0.5
    assert np.linalg.norm(T[:3, 3] - t) < 0.05
    assert int(n) > 0.8 * (X.shape[0] - 40)


def test_epnp_degenerate_rejected(rng):
    # Random garbage correspondences: should not reach min_inliers.
    N = 64
    X = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
    X[:, 2] += 6
    uv = rng.uniform(0, 640, size=(N, 2)).astype(np.float32)
    ok, T, inl, n = _solve(X, uv, rng)
    assert int(n) < 25  # no consistent pose explains random data
