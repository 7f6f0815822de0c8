import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.solvers.local_ba import (
    BAProblem,
    global_bundle_adjustment,
    local_bundle_adjustment,
)
from orb_slam_system_tpu.utils import lie

FX, FY, CX, CY = 500.0, 500.0, 320.0, 240.0


def make_problem(rng, n_cams=4, n_pts=64, noise_px=0.3, pose_pert=0.02,
                 pt_pert=0.05, n_outliers=0):
    X_true = rng.uniform(-3, 3, size=(n_pts, 3)).astype(np.float32)
    X_true[:, 2] = rng.uniform(5, 9, size=n_pts)
    Tcws = []
    for c in range(n_cams):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.3 * c  # lateral baseline
        xi[4] = 0.01 * c
        Tcws.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    Tcws = np.stack(Tcws)
    e_cam, e_pt, e_uv = [], [], []
    for c in range(n_cams):
        R, t = Tcws[c][:3, :3], Tcws[c][:3, 3]
        Xc = X_true @ R.T + t
        uv = (Xc[:, :2] / Xc[:, 2:3]) * [FX, FY] + [CX, CY]
        uv += rng.normal(size=uv.shape) * noise_px
        for p in range(n_pts):
            e_cam.append(c)
            e_pt.append(p)
            e_uv.append(uv[p])
    e_cam = np.asarray(e_cam, np.int32)
    e_pt = np.asarray(e_pt, np.int32)
    e_uv = np.asarray(e_uv, np.float32)
    outlier_idx = np.array([], np.int64)
    if n_outliers:
        outlier_idx = rng.choice(len(e_cam), size=n_outliers, replace=False)
        e_uv[outlier_idx] += rng.uniform(40, 90, size=(n_outliers, 2))
    # Perturb initial state (keep cam 0 fixed at truth).
    Tcw0 = Tcws.copy()
    for c in range(1, n_cams):
        dxi = (rng.normal(size=6) * pose_pert).astype(np.float32)
        Tcw0[c] = np.asarray(lie.se3_exp(jnp.asarray(dxi))) @ Tcws[c]
    X0 = X_true + rng.normal(size=X_true.shape).astype(np.float32) * pt_pert
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[0] = True
    prob = BAProblem(
        Tcw=jnp.asarray(Tcw0),
        cam_fixed=jnp.asarray(cam_fixed),
        cam_valid=jnp.asarray(np.ones(n_cams, bool)),
        points=jnp.asarray(X0.astype(np.float32)),
        pt_valid=jnp.asarray(np.ones(n_pts, bool)),
        e_cam=jnp.asarray(e_cam),
        e_pt=jnp.asarray(e_pt),
        e_uv=jnp.asarray(e_uv),
        e_inv_sigma2=jnp.asarray(np.ones(len(e_cam), np.float32)),
        e_valid=jnp.asarray(np.ones(len(e_cam), bool)),
    )
    return prob, Tcws, X_true, outlier_idx


def reproj_rmse(Tcw, X, prob):
    Tcw = np.asarray(Tcw)
    X = np.asarray(X)
    e_cam = np.asarray(prob.e_cam)
    e_pt = np.asarray(prob.e_pt)
    uv = np.asarray(prob.e_uv)
    errs = []
    for k in range(len(e_cam)):
        T = Tcw[e_cam[k]]
        Xc = T[:3, :3] @ X[e_pt[k]] + T[:3, 3]
        u = FX * Xc[0] / Xc[2] + CX
        v = FY * Xc[1] / Xc[2] + CY
        errs.append(((uv[k, 0] - u) ** 2 + (uv[k, 1] - v) ** 2))
    return float(np.sqrt(np.mean(errs)))


def test_global_ba_reduces_error(rng):
    prob, Tcws, X_true, _ = make_problem(rng)
    rmse0 = reproj_rmse(prob.Tcw, prob.points, prob)
    Tcw, X, inlier = global_bundle_adjustment(prob, FX, FY, CX, CY, n_iters=20)
    rmse1 = reproj_rmse(Tcw, X, prob)
    assert rmse1 < rmse0 * 0.2
    assert rmse1 < 0.6  # down to the noise floor (0.3px)
    # Fixed camera untouched.
    np.testing.assert_allclose(np.asarray(Tcw)[0], np.asarray(prob.Tcw)[0], atol=1e-6)
    # Camera poses recovered.
    for c in range(1, 4):
        dR = np.asarray(Tcw)[c][:3, :3] @ Tcws[c][:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.1


def test_local_ba_rejects_outliers(rng):
    prob, Tcws, X_true, outlier_idx = make_problem(rng, n_outliers=20)
    Tcw, X, inlier = local_bundle_adjustment(prob, FX, FY, CX, CY)
    inlier = np.asarray(inlier)
    # All injected outliers rejected; the large majority of clean edges kept
    # (some clean edges on outlier-dragged points may be dropped in stage 1
    # and never re-added — same behavior as the reference schedule).
    assert not inlier[outlier_idx].any()
    assert inlier.sum() >= 0.85 * (4 * 64 - 20)
    rmse1 = reproj_rmse(Tcw, X, prob._replace(e_valid=jnp.asarray(inlier)))
    # RMSE over inlier edges near noise floor despite outliers present.
    e_cam = np.asarray(prob.e_cam)[inlier]
    e_pt = np.asarray(prob.e_pt)[inlier]
    uv = np.asarray(prob.e_uv)[inlier]
    errs = []
    Tn = np.asarray(Tcw); Xn = np.asarray(X)
    for k in range(len(e_cam)):
        T = Tn[e_cam[k]]
        Xc = T[:3, :3] @ Xn[e_pt[k]] + T[:3, 3]
        u = FX * Xc[0] / Xc[2] + CX
        v = FY * Xc[1] / Xc[2] + CY
        errs.append(((uv[k, 0] - u) ** 2 + (uv[k, 1] - v) ** 2))
    assert float(np.sqrt(np.mean(errs))) < 0.7


def test_ba_with_padding(rng):
    # Padded slots (invalid cams/points/edges) must not disturb the solve.
    prob, Tcws, X_true, _ = make_problem(rng, n_cams=3, n_pts=32)
    C, P, E = 8, 64, 256
    pad_prob = BAProblem(
        Tcw=jnp.asarray(np.concatenate([np.asarray(prob.Tcw),
                                        np.tile(np.eye(4, dtype=np.float32), (C - 3, 1, 1))])),
        cam_fixed=jnp.asarray(np.concatenate([np.asarray(prob.cam_fixed), np.ones(C - 3, bool)])),
        cam_valid=jnp.asarray(np.concatenate([np.asarray(prob.cam_valid), np.zeros(C - 3, bool)])),
        points=jnp.asarray(np.concatenate([np.asarray(prob.points), np.zeros((P - 32, 3), np.float32)])),
        pt_valid=jnp.asarray(np.concatenate([np.asarray(prob.pt_valid), np.zeros(P - 32, bool)])),
        e_cam=jnp.asarray(np.concatenate([np.asarray(prob.e_cam), np.zeros(E - 96, np.int32)])),
        e_pt=jnp.asarray(np.concatenate([np.asarray(prob.e_pt), np.zeros(E - 96, np.int32)])),
        e_uv=jnp.asarray(np.concatenate([np.asarray(prob.e_uv), np.zeros((E - 96, 2), np.float32)])),
        e_inv_sigma2=jnp.asarray(np.concatenate([np.asarray(prob.e_inv_sigma2), np.ones(E - 96, np.float32)])),
        e_valid=jnp.asarray(np.concatenate([np.asarray(prob.e_valid), np.zeros(E - 96, bool)])),
    )
    Tcw, X, inlier = global_bundle_adjustment(pad_prob, FX, FY, CX, CY, n_iters=15)
    rmse = reproj_rmse(Tcw, X, prob._replace(Tcw=Tcw[:3], points=X[:32]))
    assert rmse < 0.7
    assert np.isfinite(np.asarray(Tcw)).all()
    assert np.isfinite(np.asarray(X)).all()


def test_cg_schur_matches_dense(rng):
    from orb_slam_system_tpu.solvers.local_ba import bundle_adjust, bundle_adjust_cg
    prob, Tcws, X_true, _ = make_problem(rng, n_cams=5, n_pts=64)
    T1, X1 = bundle_adjust(prob, FX, FY, CX, CY, n_iters=12)
    T2, X2 = bundle_adjust_cg(prob, FX, FY, CX, CY, n_iters=12, cg_iters=60)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=1e-3)
    assert reproj_rmse(T2, X2, prob) < 0.6
