"""Motion-only pose optimization (batched Levenberg-Marquardt on SE3).

Replaces reference Optimizer::PoseOptimization (src/Optimizer.cc:220-432):
one SE3 vertex, N monocular (and later stereo) reprojection edges with
per-edge information invSigma2*I and Huber kernel delta=sqrt(5.991), run as
4 rounds x 10 LM iterations with chi2-based inlier reclassification between
rounds (outliers excluded but may return); the Huber kernel is dropped after
round 2, matching the reference (:393).

TPU design: residuals/Jacobians for all N edges are one batched computation;
the normal equations are a 6x6 solve; rounds and LM iterations are
lax.fori_loop / lax.while_loop — the whole optimization is a single fused
device program with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_system_tpu.utils import lie

CHI2_MONO = 5.991          # reference src/Optimizer.cc:330
HUBER_DELTA_MONO = 2.447731  # sqrt(5.991), reference deltaMono


def _residuals_jac(xi, T0, Xw, obs, fx, fy, cx, cy):
    """Residuals e = obs - pi(exp(xi) T0 Xw) and Jacobians de/dxi.
    Returns e [N,2], J [N,2,6], z [N]."""
    T = lie.se3_exp(xi) @ T0
    R = T[:3, :3]
    t = T[:3, 3]
    Xc = Xw @ R.T + t
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    inv_z = 1.0 / zs
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    e = obs - jnp.stack([u, v], axis=1)
    # d(pi)/d(Xc): [2,3] per point.
    zero = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], axis=1),
            jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], axis=1),
        ],
        axis=1,
    )  # [N,2,3]
    # d(Xc)/d(xi) with left-multiplicative update exp(xi)*T:
    # dXc = d rho - hat(Xc) d phi  -> [I | -hat(Xc)]  [N,3,6]
    def neg_hat(p):
        px, py, pz = p[0], p[1], p[2]
        z0 = jnp.zeros_like(px)
        return jnp.stack([
            jnp.stack([z0, pz, -py]),
            jnp.stack([-pz, z0, px]),
            jnp.stack([py, -px, z0]),
        ])

    nh = jax.vmap(neg_hat)(Xc)                       # [N,3,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), nh.shape)
    J_xc = jnp.concatenate([eye, nh], axis=2)        # [N,3,6]
    # Residual is obs - pi  ->  J = -J_proj @ J_xc
    J = -jnp.einsum("nij,njk->nik", J_proj, J_xc)    # [N,2,6]
    return e, J, z


def _chi2(e, inv_sigma2):
    return jnp.sum(e * e, axis=1) * inv_sigma2


def _huber_weight(chi2, delta):
    """IRLS weight for the Huber kernel on the chi2 (g2o robustifies the
    squared error with rho(s); the equivalent IRLS weight on residuals is
    min(1, delta / sqrt(chi2))."""
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / r)


@jax.jit
def pose_optimization(
    Tcw0, Xw, obs, inv_sigma2, valid, fx, fy, cx, cy,
    n_rounds: int = 4, n_iters: int = 10,
):
    """Returns (Tcw, inlier bool[N], n_inliers i32).

    valid marks real (non-padded) correspondences; points behind the camera
    are treated as outliers automatically via huge residual masking.
    """
    f32 = jnp.float32
    Xw = Xw.astype(f32)
    obs = obs.astype(f32)
    Tcw0 = Tcw0.astype(f32)
    inlier0 = valid

    def round_body(r, carry):
        T0, inlier = carry
        use_huber = r < 2  # reference drops the kernel after round 2 (:393)

        def lm_cost(xi, active):
            e, _, z = _residuals_jac(xi, T0, Xw, obs, fx, fy, cx, cy)
            chi2 = _chi2(e, inv_sigma2)
            w_h = jnp.where(use_huber, _huber_weight(chi2, HUBER_DELTA_MONO), 1.0)
            # Robust cost (Huber rho), for step acceptance.
            rho = jnp.where(
                use_huber & (chi2 > HUBER_DELTA_MONO ** 2),
                2.0 * HUBER_DELTA_MONO * jnp.sqrt(jnp.maximum(chi2, 1e-12))
                - HUBER_DELTA_MONO ** 2,
                chi2,
            )
            ok = active & (z > 0)
            return jnp.sum(jnp.where(ok, rho, 0.0)), w_h

        def lm_iter(i, state):
            xi, lam = state
            e, J, z = _residuals_jac(xi, T0, Xw, obs, fx, fy, cx, cy)
            chi2 = _chi2(e, inv_sigma2)
            w_h = jnp.where(use_huber, _huber_weight(chi2, HUBER_DELTA_MONO), 1.0)
            w = jnp.where(inlier & (z > 0), w_h * inv_sigma2, 0.0)
            H = jnp.einsum("n,nif,nig->fg", w, J, J)
            # Gradient of 0.5*sum w e^2 wrt xi is J^T w e with e = obs-pi and
            # J = de/dxi; GN step solves H dx = -g, g = J^T w e.
            g = jnp.einsum("n,nif,ni->f", w, J, e)
            A = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6, dtype=f32)
            dx = jnp.linalg.solve(A, -g)
            cost0, _ = lm_cost(xi, inlier)
            cost1, _ = lm_cost(xi + dx, inlier)
            improved = cost1 < cost0
            xi_new = jnp.where(improved, xi + dx, xi)
            lam_new = jnp.where(improved, lam * 0.5, lam * 4.0)
            lam_new = jnp.clip(lam_new, 1e-10, 1e6)
            return xi_new, lam_new

        xi0 = jnp.zeros(6, f32)
        xi, _ = jax.lax.fori_loop(0, n_iters, lm_iter, (xi0, jnp.asarray(1e-4, f32)))
        T_new = lie.se3_exp(xi) @ T0
        # Reclassify: raw chi2 against the 95% gate (reference :348-423).
        e, _, z = _residuals_jac(jnp.zeros(6, f32), T_new, Xw, obs, fx, fy, cx, cy)
        chi2 = _chi2(e, inv_sigma2)
        inlier_new = valid & (z > 0) & (chi2 <= CHI2_MONO)
        return T_new, inlier_new

    T, inlier = jax.lax.fori_loop(0, n_rounds, round_body, (Tcw0, inlier0))
    return T, inlier, jnp.sum(inlier.astype(jnp.int32))
