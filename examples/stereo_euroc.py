"""Stereo EuRoC driver with on-the-fly rectification (reference
Examples/Stereo/stereo_euroc.cc:39-187).

Usage: python examples/stereo_euroc.py path_to_vocabulary path_to_settings \
       path_to_cam0_dir path_to_cam1_dir path_to_timestamp_file [--no-realtime]

The settings yaml must carry LEFT/RIGHT.{K,D,R,P} blocks (reference :60-98);
images are rectified with precomputed remap grids before tracking, writing
a TUM-format CameraTrajectory.txt (:187).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_rectify_map(K, D, R, P, width, height):
    """cv::initUndistortRectifyMap equivalent: for each rectified pixel,
    the source (distorted) pixel to sample. Returns (map_x, map_y)."""
    u, v = np.meshgrid(np.arange(width, dtype=np.float64),
                       np.arange(height, dtype=np.float64))
    # Rectified pixel -> normalized coords in rectified frame.
    fx_p, fy_p, cx_p, cy_p = P[0, 0], P[1, 1], P[0, 2], P[1, 2]
    x = (u - cx_p) / fx_p
    y = (v - cy_p) / fy_p
    ones = np.ones_like(x)
    pts = np.stack([x, y, ones], axis=-1)          # [H,W,3]
    # Rotate back into the original camera frame.
    pts = pts @ R  # (R^T applied to rows) -- R maps original->rectified
    x0 = pts[..., 0] / pts[..., 2]
    y0 = pts[..., 1] / pts[..., 2]
    # Apply distortion (k1,k2,p1,p2[,k3]).
    k1, k2, p1, p2 = D.flatten()[:4]
    k3 = D.flatten()[4] if D.size > 4 else 0.0
    r2 = x0 * x0 + y0 * y0
    radial = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    xd = x0 * radial + 2 * p1 * x0 * y0 + p2 * (r2 + 2 * x0 * x0)
    yd = y0 * radial + p1 * (r2 + 2 * y0 * y0) + 2 * p2 * x0 * y0
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    return (xd * fx + cx).astype(np.float32), (yd * fy + cy).astype(np.float32)


def remap_bilinear(img, map_x, map_y):
    h, w = img.shape
    x0 = np.clip(np.floor(map_x).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(map_y).astype(np.int64), 0, h - 2)
    fx = np.clip(map_x - x0, 0, 1)
    fy = np.clip(map_y - y0, 0, 1)
    out = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
           + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
    oob = (map_x < 0) | (map_x >= w - 1) | (map_y < 0) | (map_y >= h - 1)
    return np.where(oob, 0.0, out).astype(np.float32)


def main():
    if len(sys.argv) < 6:
        print(__doc__)
        sys.exit(1)
    voc_path = None if sys.argv[1].lower() == "none" else sys.argv[1]
    settings = sys.argv[2]
    cam0, cam1, ts_file = sys.argv[3], sys.argv[4], sys.argv[5]
    realtime = "--no-realtime" not in sys.argv

    from orb_slam_system_tpu.config import Sensor, load_settings
    from orb_slam_system_tpu.dataio.datasets import load_euroc, load_image_gray
    from orb_slam_system_tpu.models.system import System

    cfg = load_settings(settings, Sensor.STEREO)
    if cfg.rect_left is None:
        print("ERROR: settings lack LEFT/RIGHT rectification blocks")
        sys.exit(1)
    W, H = cfg.camera.width, cfg.camera.height
    lx, ly = build_rectify_map(cfg.rect_left["K"], cfg.rect_left["D"],
                               cfg.rect_left["R"], cfg.rect_left["P"], W, H)
    rx, ry = build_rectify_map(cfg.rect_right["K"], cfg.rect_right["D"],
                               cfg.rect_right["R"], cfg.rect_right["P"], W, H)
    paths0, times = load_euroc(cam0, ts_file)
    paths1, _ = load_euroc(cam1, ts_file)
    print(f"Images in the sequence: {len(paths0)}")
    slam = System(voc_path, cfg, Sensor.STEREO)
    track_times = []
    for i, t in enumerate(times):
        l_img = remap_bilinear(load_image_gray(paths0[i]), lx, ly)
        r_img = remap_bilinear(load_image_gray(paths1[i]), rx, ry)
        t0 = time.perf_counter()
        slam.track_stereo(l_img, r_img, t)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if realtime and i + 1 < len(times):
            wait = times[i + 1] - t - dt
            if wait > 0:
                time.sleep(wait)
    slam.shutdown()
    tt = np.sort(track_times)
    print("-------")
    print(f"median tracking time: {tt[len(tt)//2]:.5f}")
    print(f"mean tracking time: {tt.mean():.5f}")
    slam.save_trajectory_tum("CameraTrajectory.txt")


if __name__ == "__main__":
    main()
