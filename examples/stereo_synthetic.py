"""Synthetic stereo driver — analogue of the reference's stereo_kitti
(Examples/Stereo/stereo_kitti.cc:39-125): rectified pairs in, metric-scale
trajectory out (CameraTrajectory.txt, KITTI format), ATE vs ground truth.

Usage: python examples/stereo_synthetic.py [n_frames] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from orb_slam_system_tpu.config import (  # noqa: E402
    CameraConfig, ORBConfig, Sensor, SlamConfig)
from orb_slam_system_tpu.dataio.synthetic import (  # noqa: E402
    PlanarSceneRenderer, make_texture, orbit_trajectory)
from orb_slam_system_tpu.dataio import trajectory as traj_io  # noqa: E402
from orb_slam_system_tpu.models.system import System  # noqa: E402

BASELINE = 0.12  # meters


def make_config(width=320, height=240, n_features=500):
    cam = CameraConfig(fx=260.0, fy=260.0, cx=width / 2, cy=height / 2,
                       fps=30.0, width=width, height=height,
                       bf=260.0 * BASELINE)
    return SlamConfig(camera=cam, orb=ORBConfig(n_features=n_features),
                      sensor=Sensor.STEREO, th_depth=35.0)


def run(n_frames=50, out_dir=".", verbose=True, n_features=500,
        pipelined=False, async_mapping=False):
    """pipelined=True drives System.track_stereo_pipelined (the realtime
    deep-pipelined mode; device-state chain, results fetched by background
    threads `depth` frames late) instead of the sequential per-frame API."""
    cfg = make_config(n_features=n_features)
    tex = make_texture(size=2048, block=8, seed=7)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width, cfg.camera.height,
                            texture=tex, tex_scale=220.0)
    poses = orbit_trajectory(n_frames, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.STEREO, async_mapping=async_mapping)
    gt = {}
    for i, Tcw in enumerate(poses):
        R = Tcw[:3, :3]
        gt[i / 30.0] = (-R.T @ Tcw[:3, 3]).astype(np.float64)
    if pipelined:
        def gen():
            for i, Tcw in enumerate(poses):
                left, right = r.render_stereo(Tcw, BASELINE)
                yield left, right, i / 30.0
        for i, _ in enumerate(slam.track_stereo_pipelined(gen())):
            if verbose:
                print(f"frame {i:3d} "
                      f"state={slam.get_tracking_state().name:16s} "
                      f"kfs={slam.arena.n_keyframes()}", flush=True)
    else:
        for i, Tcw in enumerate(poses):
            ts = i / 30.0
            left, right = r.render_stereo(Tcw, BASELINE)
            slam.track_stereo(left, right, ts)
            if verbose:
                print(f"frame {i:3d} "
                      f"state={slam.get_tracking_state().name:16s} "
                      f"tracked={len(slam.get_tracked_map_points()):4d} "
                      f"kfs={slam.arena.n_keyframes()} "
                      f"mps={slam.arena.n_points()}", flush=True)
    slam.shutdown()
    slam.save_trajectory_kitti(os.path.join(out_dir, "CameraTrajectory.txt"))
    slam.save_keyframe_trajectory_tum(
        os.path.join(out_dir, "KeyFrameTrajectory.txt"))
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    rmse = traj_io.ate_rmse(est, gt, with_scale=False)  # SE3-only: metric
    # Metric scale check: compare estimated vs true inter-frame distance.
    est_pos = [(-T[:3, :3].T @ T[:3, 3]) for _, T, l in est if not l]
    scale_est = (np.linalg.norm(est_pos[-1] - est_pos[0])
                 if len(est_pos) > 2 else 0.0)
    ts_sorted = sorted(gt)
    scale_gt = np.linalg.norm(gt[ts_sorted[-1]] - gt[ts_sorted[0]])
    print(f"frames tracked: {sum(1 for _,_,l in est if not l)}/{n_frames}")
    print(f"ATE RMSE: {rmse*100:.2f} cm | metric scale est/gt = "
          f"{scale_est:.3f}/{scale_gt:.3f}")
    return slam, rmse, scale_est, scale_gt


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 50
    out = args[1] if len(args) > 1 else "."
    run(n, out, pipelined="--pipelined" in sys.argv,
        async_mapping="--async" in sys.argv)
