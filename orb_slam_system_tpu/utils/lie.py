"""SO3 / SE3 / Sim3 Lie group operations in JAX.

Replaces the reference's g2o SE3Quat (Thirdparty/g2o/g2o/types/se3quat.h) and
Sim3 (types/sim3.h) plus Converter.cc quaternion conversions, as pure
functional, batch-friendly (vmap-able) float32/float64 ops.

Conventions:
  - Rotations are 3x3 matrices; transforms Tcw are 4x4 with [R t; 0 1].
  - se3 tangent vectors are [rho(3), phi(3)] = [translation, rotation]
    (matches g2o's SE3Quat::exp update ordering with omega second — we use
    (upsilon, omega) ordering: first 3 translation, last 3 rotation).
  - sim3 tangent is [rho(3), phi(3), sigma(1)] with scale s = exp(sigma).
All functions work on single elements; wrap with jax.vmap for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


@jax.jit
def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so3 hat operator: w (3,) -> skew-symmetric (3,3)."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


@jax.jit
def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, numerically safe near theta=0 (denominators are
    double-where-guarded so gradients at theta=0 are NaN-free)."""
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    big = theta2 > _EPS
    theta2_safe = jnp.where(big, theta2, 1.0)
    # sin(x)/x and (1-cos x)/x^2 with Taylor guards.
    A = jnp.where(big, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    B = jnp.where(big, (1.0 - jnp.cos(theta)) / theta2_safe, 0.5 - theta2 / 24.0)
    return jnp.eye(3, dtype=w.dtype) + A * W + B * (W @ W)


@jax.jit
def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map SO3 -> so3 via the unit quaternion (numerically stable for all
    angles including near pi; branch selection happens in quat_from_rot)."""
    q = quat_from_rot(R)
    # Enforce w >= 0 so the angle lands in [0, pi].
    q = jnp.where(q[3] < 0, -q, q)
    qv = q[:3]
    cos_half = q[3]
    # ||qv|| with a NaN-free gradient at zero (norm's grad is 0/0 there).
    norm2 = jnp.dot(qv, qv)
    big = norm2 > 1e-12
    sin_half = jnp.sqrt(jnp.where(big, norm2, 1.0))
    theta = 2.0 * jnp.arctan2(sin_half, cos_half)
    # theta / sin(theta/2); near zero -> 2 (error O(theta^2), below the
    # branch threshold).
    scale = jnp.where(big, theta / sin_half, 2.0)
    return scale * qv


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    big = theta2 > _EPS
    theta2_safe = jnp.where(big, theta2, 1.0)
    B = jnp.where(big, (1.0 - jnp.cos(theta)) / theta2_safe, 0.5 - theta2 / 24.0)
    C = jnp.where(
        big, (theta - jnp.sin(theta)) / (theta2_safe * theta),
        1.0 / 6.0 - theta2 / 120.0
    )
    return jnp.eye(3, dtype=w.dtype) + B * W + C * (W @ W)


@jax.jit
def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se3 (6,) [rho, phi] -> SE3 (4,4)."""
    rho, phi = xi[:3], xi[3:6]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = V @ rho
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@jax.jit
def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    phi = so3_log(T[:3, :3])
    V = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(V, T[:3, 3])
    return jnp.concatenate([rho, phi])


@jax.jit
def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def so3_project(R: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Project a near-rotation 3x3 matrix onto SO(3) (closest rotation in
    Frobenius norm = the polar factor), via the Newton–Schulz iteration
    X <- X(3I - X^T X)/2 — compiler-friendly (no SVD, just 3x3 matmuls).

    Pre-scaling to Frobenius norm sqrt(3) puts every singular value in
    (0, sqrt(3)], the iteration's convergence region, so the projection
    also self-heals badly degraded inputs (det well below 1), not just
    rounding-level drift. Requires det(R) > 0 (true for any pose that
    started as a rotation and decayed by accumulation)."""
    X = R * jax.lax.rsqrt(jnp.maximum(jnp.sum(R * R) / 3.0, 1e-12))
    I = jnp.eye(3, dtype=R.dtype)
    for _ in range(iters):
        X = 0.5 * (X @ (3.0 * I - X.T @ X))
    return X


def se3_project(T: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Re-orthonormalize the rotation block of a 4x4 pose, keeping t.

    Used by the pipelined (device-state) tracking chain: each chain step
    feeds poses produced by the previous step back through f32 matmul
    products, and any orthogonality error compounds geometrically through
    `velocity = T_last @ inv(T_prev)` when inv() is the transpose trick —
    measured decay reached det(R) = 0.59 after ~12 chained frames, moving
    projections by >100 px and collapsing the match count. Projecting the
    state each step bounds the drift at one step's rounding (~1e-7)."""
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(so3_project(T[:3, :3], iters))
    out = out.at[:3, 3].set(T[:3, 3])
    return out


def se3_project_np(T):
    """Host (numpy, f64) exact SE(3) projection via SVD — bootstrap-time
    defense for poses already stored in host bookkeeping."""
    import numpy as np
    U, _, Vt = np.linalg.svd(np.asarray(T[:3, :3], np.float64))
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = U @ np.diag([1.0, 1.0, -1.0]) @ Vt
    out = np.eye(4, dtype=np.float64)
    out[:3, :3] = R
    out[:3, 3] = T[:3, 3]
    return out


def se3_mul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


@jax.jit
def se3_apply(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply SE3 to points X (..., 3)."""
    return X @ T[:3, :3].T + T[:3, 3]


@jax.jit
def quat_from_rot(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order
    (reference src/System.cc:355 writes qx qy qz qw via Converter)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def case_w(_):
        s = jnp.sqrt(jnp.clip(tr + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s])

    def case_x(_):
        s = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s])

    def case_y(_):
        s = jnp.sqrt(jnp.clip(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s])

    def case_z(_):
        s = jnp.sqrt(jnp.clip(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s])

    # Branchless selection of the numerically best case.
    idx = jnp.argmax(jnp.stack([tr, m00, m11, m22]))
    use_w = tr > 0
    branch = jnp.where(use_w, 0, idx + 1)
    q = jax.lax.switch(branch, [case_w, case_x, case_y, case_z, ], None)
    return q / jnp.linalg.norm(q)


@jax.jit
def rot_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix."""
    q = q / jnp.linalg.norm(q)
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
        ]
    )


# ---------------------------------------------------------------------------
# Sim3 (for loop closing; reference g2o/types/sim3.h)
# ---------------------------------------------------------------------------


def sim3_make(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> dict:
    return {"R": R, "t": t, "s": jnp.asarray(s)}


@jax.jit
def sim3_apply(S: dict, X: jnp.ndarray) -> jnp.ndarray:
    return S["s"] * (X @ S["R"].T) + S["t"]


@jax.jit
def sim3_mul(A: dict, B: dict) -> dict:
    """A after B: (sA RA, tA, sA) * (sB RB, tB) = (sA sB RA RB, sA RA tB + tA)."""
    return {
        "R": A["R"] @ B["R"],
        "t": A["s"] * (A["R"] @ B["t"]) + A["t"],
        "s": A["s"] * B["s"],
    }


@jax.jit
def sim3_inv(S: dict) -> dict:
    Rinv = S["R"].T
    sinv = 1.0 / S["s"]
    return {"R": Rinv, "t": -sinv * (Rinv @ S["t"]), "s": sinv}


@jax.jit
def sim3_exp(xi: jnp.ndarray) -> dict:
    """sim3 (7,) [rho, phi, sigma] -> Sim3. Uses the closed-form W matrix
    (Strasdat's thesis), with Taylor guards near zero angle/scale."""
    rho, phi, sigma = xi[:3], xi[3:6], xi[6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(phi)
    eps = 1e-5
    # Coefficients for W-matrix: V = A I + B Wn + C Wn^2 with scale coupling.
    near_zero_sigma = jnp.abs(sigma) < eps
    near_zero_theta = theta < eps

    def nz(x):
        # Safe denominator: unselected where-branches must not produce
        # inf/nan; replaces near-zero values by 1 (result discarded anyway).
        return jnp.where(jnp.abs(x) < _EPS, jnp.ones_like(x), x)

    # General closed-form (Sophus RxSO3 style):
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c = jnp.where(near_zero_theta, jnp.ones_like(theta2), theta2 + sigma * sigma)
    A_gen = jnp.where(
        near_zero_sigma,
        jnp.where(near_zero_theta, 0.5, (1.0 - jnp.cos(theta)) / nz(theta2)),
        jnp.where(
            near_zero_theta,
            ((sigma - 1.0) * s + 1.0) / nz(sigma * sigma),
            (a * sigma + (1.0 - b) * theta) / nz(theta * c),
        ),
    )
    B_gen = jnp.where(
        near_zero_sigma,
        jnp.where(near_zero_theta, 1.0 / 6.0, (theta - jnp.sin(theta)) / nz(theta2 * theta)),
        jnp.where(
            near_zero_theta,
            (s * (0.5 * sigma * sigma - sigma + 1.0) - 1.0) / nz(sigma * sigma * sigma),
            ((s - 1.0) / nz(sigma) - ((b - 1.0) * sigma + a * theta) / nz(c))
            / nz(theta2),
        ),
    )
    C_ = jnp.where(near_zero_sigma, 1.0, (s - 1.0) / nz(sigma))
    Wmat = C_ * jnp.eye(3, dtype=xi.dtype) + A_gen * W + B_gen * (W @ W)
    t = Wmat @ rho
    return {"R": R, "t": t, "s": s}


@jax.jit
def sim3_log(S: dict) -> jnp.ndarray:
    phi = so3_log(S["R"])
    sigma = jnp.log(S["s"])
    # Invert the W matrix numerically (3x3, cheap and robust).
    xi7 = jnp.concatenate([jnp.zeros(3, dtype=phi.dtype), phi, sigma[None]])
    Wmat = _sim3_W(phi, sigma, S["R"].dtype)
    rho = jnp.linalg.solve(Wmat, S["t"])
    return jnp.concatenate([rho, phi, sigma[None]])


def _sim3_W(phi: jnp.ndarray, sigma: jnp.ndarray, dtype) -> jnp.ndarray:
    xi = jnp.concatenate([jnp.zeros(3, dtype=dtype), phi, sigma[None].astype(dtype)])
    # Recompute the same W used in sim3_exp by calling it with unit rho basis.
    e = jnp.eye(3, dtype=dtype)

    def col(i):
        x = xi.at[:3].set(e[i])
        return sim3_exp(x)["t"]

    return jnp.stack([col(0), col(1), col(2)], axis=1)
