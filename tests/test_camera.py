import jax.numpy as jnp
import numpy as np

from orb_slam_system_tpu.utils import camera


FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3  # TUM1-class intrinsics
DIST = dict(k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633)


def test_project_unproject_roundtrip(rng):
    X = rng.uniform(-1, 1, size=(20, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(0.5, 5.0, size=20)
    uv = camera.project(jnp.asarray(X), FX, FY, CX, CY)
    X2 = camera.unproject(uv, jnp.asarray(X[:, 2]), FX, FY, CX, CY)
    np.testing.assert_allclose(np.asarray(X2), X, atol=1e-4)


def test_undistort_identity_when_no_distortion(rng):
    uv = rng.uniform(0, 640, size=(50, 2)).astype(np.float32)
    out = camera.undistort_points(jnp.asarray(uv), FX, FY, CX, CY, 0, 0, 0, 0, 0)
    np.testing.assert_allclose(np.asarray(out), uv, atol=1e-4)


def test_undistort_inverts_distortion(rng):
    # Generate undistorted normalized points, distort them, then undistort the
    # corresponding pixels; should recover the original pixel positions.
    xy = rng.uniform(-0.4, 0.4, size=(100, 2)).astype(np.float32)
    xyd = camera.distort_normalized(jnp.asarray(xy), **DIST)
    uv_dist = np.asarray(xyd) * [FX, FY] + [CX, CY]
    uv_true = xy * [FX, FY] + [CX, CY]
    out = camera.undistort_points(jnp.asarray(uv_dist, jnp.float32),
                                  FX, FY, CX, CY, **DIST, iters=20)
    np.testing.assert_allclose(np.asarray(out), uv_true, atol=0.1)


def test_image_bounds_no_distortion():
    b = camera.compute_image_bounds(640, 480, FX, FY, CX, CY, 0, 0, 0, 0, 0)
    vals = [float(x) for x in b]
    np.testing.assert_allclose(vals, [0, 640, 0, 480], atol=1e-3)
