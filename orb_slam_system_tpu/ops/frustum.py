"""Frustum visibility check + scale prediction for map points.

Replaces reference Frame::isInFrustum (src/Frame.cc:249-305) and
MapPoint::PredictScale (src/MapPoint.cc:353-373) as one batched device op
over padded map-point arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

VIEWING_COS_LIMIT = 0.5  # reference src/Tracking.cc:683 isInFrustum(pMP, 0.5)


@jax.jit
def frustum_check(
    Xw, normals, min_dist, max_dist, pt_valid,
    Tcw, fx, fy, cx, cy, min_x, max_x, min_y, max_y,
    log_scale_factor, n_levels,
):
    """Batched isInFrustum.

    Xw: f32[P,3] world positions; normals: f32[P,3] mean viewing directions;
    min/max_dist: f32[P] scale-invariance band; Tcw: f32[4,4].

    Returns dict with:
      visible: bool[P]; proj_xy: f32[P,2]; pred_level: i32[P];
      view_cos: f32[P]; dist: f32[P].
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    Xc = Xw @ R.T + t
    z = Xc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * Xc[:, 0] * inv_z + cx
    v = fy * Xc[:, 1] * inv_z + cy
    in_img = (u >= min_x) & (u < max_x) & (v >= min_y) & (v < max_y)
    Ow = -R.T @ t
    PO = Xw - Ow[None, :]
    dist = jnp.linalg.norm(PO, axis=1)
    in_band = (dist >= min_dist) & (dist <= max_dist)
    view_cos = jnp.sum(PO * normals, axis=1) / jnp.maximum(dist, 1e-9)
    # PredictScale (reference src/MapPoint.cc:353-373):
    # level = ceil(log(maxDist / dist) / log(scaleFactor)).
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(ratio) / log_scale_factor).astype(jnp.int32)
    level = jnp.clip(level, 0, n_levels - 1)
    visible = (
        pt_valid & (z > 0.0) & in_img & in_band
        & (view_cos > VIEWING_COS_LIMIT)
    )
    return {
        "visible": visible,
        "proj_xy": jnp.stack([u, v], axis=1),
        "pred_level": level,
        "view_cos": view_cos,
        "dist": dist,
    }
