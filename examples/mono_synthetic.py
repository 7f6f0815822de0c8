"""Synthetic monocular driver — the hermetic analogue of the reference's
mono_tum (Examples/Monocular/mono_tum.cc:36-126): runs the full SLAM
pipeline over a rendered sequence with known ground truth, prints per-frame
state and the exit timing report, writes KeyFrameTrajectory.txt /
CameraTrajectory.txt, and evaluates ATE RMSE against ground truth.

Usage: python examples/mono_synthetic.py [n_frames] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from orb_slam_system_tpu.config import (  # noqa: E402
    CameraConfig, ORBConfig, Sensor, SlamConfig, TrackingState)
from orb_slam_system_tpu.dataio.synthetic import (  # noqa: E402
    PlanarSceneRenderer, make_texture, orbit_trajectory)
from orb_slam_system_tpu.dataio import trajectory as traj_io  # noqa: E402
from orb_slam_system_tpu.models.system import System  # noqa: E402


def make_config(width=320, height=240, n_features=500):
    cam = CameraConfig(fx=260.0, fy=260.0, cx=width / 2, cy=height / 2,
                       fps=30.0, width=width, height=height)
    return SlamConfig(camera=cam, orb=ORBConfig(n_features=n_features),
                      sensor=Sensor.MONOCULAR)


def run(n_frames=80, out_dir=".", verbose=True, n_features=500):
    cfg = make_config(n_features=n_features)
    tex = make_texture(size=2048, block=8, seed=7)
    renderer = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width,
                                   cfg.camera.height, texture=tex,
                                   tex_scale=220.0)
    poses = orbit_trajectory(n_frames, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.MONOCULAR)
    gt = {}
    for i, Tcw in enumerate(poses):
        ts = i / 30.0
        img = renderer.render(Tcw)
        out = slam.track_monocular(img, ts)
        R = Tcw[:3, :3]
        gt[ts] = (-R.T @ Tcw[:3, 3]).astype(np.float64)  # camera center
        if verbose:
            st = slam.get_tracking_state().name
            n_trk = len(slam.get_tracked_map_points())
            print(f"frame {i:3d} state={st:16s} tracked={n_trk:4d} "
                  f"kfs={slam.arena.n_keyframes()} mps={slam.arena.n_points()}",
                  flush=True)
    slam.shutdown()
    rep = slam.timing_report()
    print(f"median tracking time: {rep['median_s']*1000:.1f} ms")
    print(f"mean tracking time:   {rep['mean_s']*1000:.1f} ms")
    slam.save_keyframe_trajectory_tum(os.path.join(out_dir, "KeyFrameTrajectory.txt"))
    slam.save_trajectory_tum(os.path.join(out_dir, "CameraTrajectory.txt"))
    slam.save_trajectory_kitti(os.path.join(out_dir, "CameraTrajectoryKITTI.txt"))
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    rmse = traj_io.ate_rmse(est, gt)
    print(f"frames tracked: {sum(1 for _,_,l in est if not l)}/{n_frames}")
    print(f"ATE RMSE (Sim3-aligned): {rmse*100:.2f} cm")
    return slam, rmse


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    out = sys.argv[2] if len(sys.argv) > 2 else "."
    run(n, out)
