import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_system_tpu.utils import lie

jax.config.update("jax_enable_x64", False)


def random_rotation(rng, scale=1.0):
    w = rng.normal(size=3) * scale
    return np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-6, 0.1, 1.0, 2.0]:
        w = (rng.normal(size=3) * scale).astype(np.float32)
        R = lie.so3_exp(jnp.asarray(w))
        w2 = lie.so3_log(R)
        R2 = lie.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_so3_exp_is_rotation(rng):
    w = rng.normal(size=3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.det(R) - 1.0) < 1e-5


def test_se3_exp_log_roundtrip(rng):
    xi = (rng.normal(size=6) * 0.5).astype(np.float32)
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)


def test_se3_inv(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.5
    T = lie.se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ lie.se3_inv(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_se3_apply(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.3
    T = lie.se3_exp(jnp.asarray(xi))
    X = rng.normal(size=(10, 3)).astype(np.float32)
    Y = np.asarray(lie.se3_apply(T, jnp.asarray(X)))
    Y_ref = (np.asarray(T)[:3, :3] @ X.T).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(Y, Y_ref, atol=1e-5)


def test_quat_roundtrip(rng):
    for _ in range(10):
        R = random_rotation(rng, scale=2.0)
        q = lie.quat_from_rot(jnp.asarray(R, jnp.float32))
        R2 = np.asarray(lie.rot_from_quat(q))
        np.testing.assert_allclose(R, R2, atol=1e-4)


def test_quat_identity():
    q = np.asarray(lie.quat_from_rot(jnp.eye(3)))
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-6)


def test_sim3_exp_log_roundtrip(rng):
    xi = np.concatenate([rng.normal(size=6) * 0.4, [0.3]]).astype(np.float32)
    S = lie.sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.sim3_log(S))
    np.testing.assert_allclose(xi, xi2, atol=1e-4)


def test_sim3_mul_inv(rng):
    xa = np.concatenate([rng.normal(size=6) * 0.3, [0.2]]).astype(np.float32)
    xb = np.concatenate([rng.normal(size=6) * 0.3, [-0.1]]).astype(np.float32)
    A = lie.sim3_exp(jnp.asarray(xa))
    B = lie.sim3_exp(jnp.asarray(xb))
    X = rng.normal(size=(5, 3)).astype(np.float32)
    # (A*B)(x) == A(B(x))
    AB = lie.sim3_mul(A, B)
    y1 = np.asarray(lie.sim3_apply(AB, jnp.asarray(X)))
    y2 = np.asarray(lie.sim3_apply(A, lie.sim3_apply(B, jnp.asarray(X))))
    np.testing.assert_allclose(y1, y2, atol=1e-4)
    # A * A^-1 == identity action
    Ainv = lie.sim3_inv(A)
    y3 = np.asarray(lie.sim3_apply(lie.sim3_mul(A, Ainv), jnp.asarray(X)))
    np.testing.assert_allclose(y3, X, atol=1e-4)


def test_sim3_scale_action():
    S = lie.sim3_make(jnp.eye(3), jnp.zeros(3), 2.0)
    X = jnp.ones((1, 3))
    np.testing.assert_allclose(np.asarray(lie.sim3_apply(S, X)), 2 * np.ones((1, 3)), atol=1e-6)


def test_so3_project_near_rotation(rng):
    """Rounding-level drift: projection returns the nearby rotation."""
    R = np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(size=3).astype(np.float32))))
    Rp = R + rng.normal(size=(3, 3)).astype(np.float32) * 1e-4
    out = np.asarray(lie.so3_project(jnp.asarray(Rp)))
    np.testing.assert_allclose(out @ out.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(out) > 0.99
    np.testing.assert_allclose(out, R, atol=1e-3)


def test_so3_project_self_heals_degraded(rng):
    """The pipelined chain's measured failure mode: a pose whose rotation
    block decayed to det ~0.6 must still project to a proper rotation
    near the polar factor (numpy SVD oracle)."""
    R = np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(size=3).astype(np.float32))), dtype=np.float64)
    # Apply an anisotropic squash like the measured decay (det 0.59).
    U, _, Vt = np.linalg.svd(R)
    Rd = (U @ np.diag([1.05, 0.9, 0.62]) @ Vt).astype(np.float32)
    out = np.asarray(lie.so3_project(jnp.asarray(Rd)))
    np.testing.assert_allclose(out @ out.T, np.eye(3), atol=1e-4)
    # Polar factor of U diag(s) Vt with positive s is U Vt.
    np.testing.assert_allclose(out, U @ Vt, atol=1e-3)


def test_se3_project_matches_np(rng):
    T = np.asarray(lie.se3_exp(jnp.asarray(
        rng.normal(size=6).astype(np.float32) * 0.5)), dtype=np.float64)
    T[:3, :3] += rng.normal(size=(3, 3)) * 0.01
    dev = np.asarray(lie.se3_project(jnp.asarray(T.astype(np.float32))))
    host = lie.se3_project_np(T)
    np.testing.assert_allclose(dev, host, atol=1e-4)
    np.testing.assert_allclose(dev[:3, 3], T[:3, 3], atol=1e-6)
    np.testing.assert_allclose(dev[3], [0, 0, 0, 1], atol=0)
