"""Loop-closure end-to-end demo: a closed circle with a degraded middle
segment (motion blur + noise) that accumulates real scale/pose drift;
returning to the start triggers BoW loop detection -> Sim3 -> correction ->
essential graph -> GBA.

Reference flow exercised: DetectLoop consistency groups, ComputeSim3,
CorrectLoop (src/LoopClosing.cc) with upstream-complete loop edges + GBA.

Observed on this scene (CPU, deterministic): loop closes at the revisit
(Sim3 scale ~0.92 recovered from drift), 169/170 frames tracked,
final ATE RMSE ~2.3 cm over a ~10 m circle (~22 cm without the closure).

Usage: python examples/loop_synthetic.py [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def blur(img, sigma):
    k = np.exp(-np.arange(-4, 5) ** 2 / (2 * sigma ** 2))
    k /= k.sum()
    img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, img)
    return img


def run(n_frames=170, verbose=True, noise=4.5, blur_sigma=1.8,
        pipelined=False):
    from examples.mono_synthetic import make_config
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, loop_trajectory)
    from orb_slam_system_tpu.dataio import trajectory as traj_io
    from orb_slam_system_tpu.models.system import System

    cfg = make_config(n_features=400)
    tex = make_texture(size=2048, block=8, seed=7)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width, cfg.camera.height,
                            texture=tex, tex_scale=220.0)
    poses = loop_trajectory(n_frames, radius=1.6, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.MONOCULAR)
    rng = np.random.default_rng(1)
    gt = {}
    lo, hi = int(0.18 * n_frames), int(0.53 * n_frames)
    def make_frame(i, Tcw):
        ts = i / 30.0
        img = r.render(Tcw)
        if lo <= i <= hi:  # degraded middle segment -> drift accumulates
            img = blur(img, blur_sigma).astype(np.float32) + \
                rng.normal(size=img.shape).astype(np.float32) * noise
        R = Tcw[:3, :3]
        gt[ts] = (-R.T @ Tcw[:3, 3]).astype(np.float64)
        return img, ts

    def progress(i):
        if verbose and i % 10 == 0:
            print(f"frame {i:3d} {slam.get_tracking_state().name:16s} "
                  f"kfs={slam.arena.n_keyframes()} "
                  f"loops={slam.loop_closer.n_loops_closed}", flush=True)

    if pipelined:
        # Deep-pipelined (device-state) tracking through a full loop
        # closure: CorrectLoop rewrites keyframe/point poses while chain
        # steps are in flight on the pre-correction state; the margin
        # gate must catch the mismatch and re-anchor classically.
        def gen():
            for i, Tcw in enumerate(poses):
                yield make_frame(i, Tcw)
        for i, _ in enumerate(slam.track_monocular_pipelined(gen())):
            progress(i)
    else:
        for i, Tcw in enumerate(poses):
            img, ts = make_frame(i, Tcw)
            slam.track_monocular(img, ts)
            progress(i)
    slam.shutdown()
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    rmse = traj_io.ate_rmse(est, gt)
    n_tracked = sum(1 for _, _, l in est if not l)
    print(f"loops closed: {slam.loop_closer.n_loops_closed}")
    print(f"frames tracked: {n_tracked}/{n_frames}")
    print(f"ATE RMSE: {rmse*100:.2f} cm")
    return slam, rmse, n_tracked


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 170
    noise = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    run(n, noise=noise)
