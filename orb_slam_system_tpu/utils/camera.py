"""Pinhole camera model with radial-tangential distortion.

Covers what the reference gets from OpenCV: projection, unprojection,
`undistortPoints` (reference src/Frame.cc:384-414 uses cv::undistortPoints),
and the frustum check used by isInFrustum (src/Frame.cc:249-305).

All functions are pure, batched over the leading axes, jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def project(X_cam: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel coords (..., 2). No distortion
    (the SLAM pipeline works on undistorted keypoints, as the reference does)."""
    z = X_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * X_cam[..., 0] * inv_z + cx
    v = fy * X_cam[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


@jax.jit
def unproject(uv: jnp.ndarray, z: jnp.ndarray, fx, fy, cx, cy) -> jnp.ndarray:
    """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3).
    (reference src/Frame.cc:646-660 UnprojectStereo)."""
    x = (uv[..., 0] - cx) / fx * z
    y = (uv[..., 1] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


@jax.jit
def distort_normalized(xy: jnp.ndarray, k1, k2, p1, p2, k3) -> jnp.ndarray:
    """Apply radtan distortion to normalized image coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


@jax.jit
def undistort_points(uv: jnp.ndarray, fx, fy, cx, cy, k1, k2, p1, p2, k3,
                     iters: int = 8) -> jnp.ndarray:
    """Iteratively invert the distortion (cv::undistortPoints equivalent,
    fixed-point iteration as OpenCV does). uv (..., 2) pixel coords in,
    undistorted pixel coords out. Output equals input when all coeffs are 0."""
    x0 = (uv[..., 0] - cx) / fx
    y0 = (uv[..., 1] - cy) / fy
    xy0 = jnp.stack([x0, y0], axis=-1)

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xn = (xy0[..., 0] - dx) / radial
        yn = (xy0[..., 1] - dy) / radial
        return jnp.stack([xn, yn], axis=-1)

    xy = jax.lax.fori_loop(0, iters, body, xy0)
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def compute_image_bounds(width: int, height: int, fx, fy, cx, cy,
                         k1, k2, p1, p2, k3):
    """Undistorted image bounds from the 4 corners (reference
    src/Frame.cc ComputeImageBounds). Returns (min_x, max_x, min_y, max_y)."""
    corners = jnp.array(
        [[0.0, 0.0], [width, 0.0], [0.0, height], [width, height]], dtype=jnp.float32
    )
    und = undistort_points(corners, fx, fy, cx, cy, k1, k2, p1, p2, k3)
    min_x = jnp.minimum(und[0, 0], und[2, 0])
    max_x = jnp.maximum(und[1, 0], und[3, 0])
    min_y = jnp.minimum(und[0, 1], und[1, 1])
    max_y = jnp.maximum(und[2, 1], und[3, 1])
    return min_x, max_x, min_y, max_y
