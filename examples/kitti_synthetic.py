"""KITTI-00-scale drive-style synthetic stress: ~4000 frames, long
straights + 90-degree turns + same-direction revisits.

The reference's one committed artifact is a real 4541-frame KITTI-format
trajectory (/root/reference/CameraTrajectory.txt:1-4541; driver
Examples/Monocular/mono_kitti.cc). This driver reproduces that scale and
revisit structure synthetically: a rounded-rectangle "city block" circuit
traversed multiple laps with a tangent (car-like) heading, so the second
lap revisits every street in the SAME direction — loop closures can fire
continuously, and keyframe culling + spanning-tree surgery + trajectory
export through culled references (src/System.cc:398-451 semantics) get
stressed at the artifact's length.

Usage: python examples/kitti_synthetic.py [n_frames] [out_dir] [--async]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def drive_trajectory(n_frames: int, width: float = 36.0,
                     height: float = 18.0, corner: float = 3.0,
                     laps: float = 2.0, depth: float = -2.0,
                     tilt: float = 0.3):
    """Rounded-rectangle circuit with tangent heading.

    Returns a list of camera-from-world T (4x4): the camera rides at
    constant height `|depth|` above the textured ground plane, pitched
    down by `tilt`, yawed along the direction of travel."""
    w, h, c = width - 2 * corner, height - 2 * corner, corner
    seg_lens = [w, np.pi / 2 * c, h, np.pi / 2 * c,
                w, np.pi / 2 * c, h, np.pi / 2 * c]
    per = float(sum(seg_lens))
    starts = np.cumsum([0.0] + seg_lens)

    def point(s):
        """Position + heading at arclength s along one lap (counter-
        clockwise, starting at the bottom-left corner of the bottom
        straight)."""
        s = s % per
        i = int(np.searchsorted(starts[1:], s, side="right"))
        t = s - starts[i]
        # Straight segment anchors (centered rectangle).
        x0, y0 = -w / 2, -height / 2
        x1, y1 = w / 2, height / 2
        if i == 0:    # bottom, +x
            return np.array([x0 + t, y0]), 0.0
        if i == 1:    # corner bottom-right
            a = t / c
            ctr = np.array([x1, y0 + c])
            return ctr + c * np.array([np.sin(a), -np.cos(a)]), a
        if i == 2:    # right, +y
            return np.array([x1 + c, y0 + c + t]), np.pi / 2
        if i == 3:
            a = t / c
            ctr = np.array([x1, y1 - c])
            return ctr + c * np.array([np.cos(a), np.sin(a)]), np.pi / 2 + a
        if i == 4:    # top, -x (y = y1: the TR arc ends at (x1, y1) and
            # the TL arc starts at (x0, y1) — anchoring at y1 + c
            # teleported the camera 3 m at both boundaries, an instant
            # kidnap that killed tracking at the same arclength every lap)
            return np.array([x1 - t, y1]), np.pi
        if i == 5:
            a = t / c
            ctr = np.array([x0, y1 - c])
            return ctr + c * np.array([-np.sin(a), np.cos(a)]), np.pi + a
        if i == 6:    # left, -y
            return np.array([x0 - c, y1 - c - t]), 3 * np.pi / 2
        a = t / c
        ctr = np.array([x0, y0 + c])
        return ctr + c * np.array([-np.cos(a), -np.sin(a)]), 3 * np.pi / 2 + a

    ct, st_ = np.cos(tilt), np.sin(tilt)
    R_tilt = np.array([[1.0, 0.0, 0.0], [0.0, ct, -st_], [0.0, st_, ct]])
    total = laps * per
    poses = []
    for i in range(n_frames):
        s = total * i / n_frames
        xy, th = point(s)
        # Yaw about the plane normal (world z), then the fixed pitch-down.
        cz, sz = np.cos(th), np.sin(th)
        R_yaw = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
        R_cw = R_tilt.T @ R_yaw.T
        C = np.array([xy[0], xy[1], depth])
        T = np.eye(4)
        T[:3, :3] = R_cw
        T[:3, 3] = -R_cw @ C
        poses.append(T)
    return poses


def run(n_frames=4000, out_dir=None, verbose=True, n_features=400,
        async_mapping=False, laps=2.0):
    from examples.mono_synthetic import make_config
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture)
    from orb_slam_system_tpu.dataio import trajectory as traj_io
    from orb_slam_system_tpu.models.system import System

    cfg = make_config(n_features=n_features)
    # The circuit spans ~40 m; texture must cover it without clamping.
    tex = make_texture(size=8192, block=8, seed=11)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width,
                            cfg.camera.height, texture=tex, tex_scale=200.0)
    poses = drive_trajectory(n_frames, laps=laps)
    slam = System(None, cfg, Sensor.MONOCULAR, async_mapping=async_mapping)
    gt = {}
    host_ms = []
    kf_counts = []
    t_start = time.perf_counter()

    def gen():
        for i, Tcw in enumerate(poses):
            ts = i / 30.0
            img = r.render(Tcw)
            R3 = Tcw[:3, :3]
            gt[ts] = (-R3.T @ Tcw[:3, 3]).astype(np.float64)
            yield img, ts

    t0 = time.perf_counter()
    for i, _ in enumerate(slam.track_monocular_pipelined(gen())):
        host_ms.append((time.perf_counter() - t0) * 1e3)
        kf_counts.append(slam.arena.n_keyframes())
        if verbose and i % 100 == 0:
            print(f"frame {i:5d} {slam.get_tracking_state().name:16s} "
                  f"kfs={kf_counts[-1]:4d} mps={slam.arena.n_points():5d} "
                  f"loops={slam.loop_closer.n_loops_closed} "
                  f"host={host_ms[-1]:.0f}ms", flush=True)
        t0 = time.perf_counter()
    slam.shutdown()
    wall_s = time.perf_counter() - t_start
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    rmse = traj_io.ate_rmse(est, gt)
    n_tracked = sum(1 for _, _, lost in est if not lost)
    third = max(n_frames // 3, 1)
    med = lambda xs: float(np.median(xs)) if len(xs) else 0.0  # noqa: E731
    summary = {
        "n_frames": n_frames,
        "n_tracked": n_tracked,
        "n_keyframes_final": slam.arena.n_keyframes(),
        "n_keyframes_peak": int(max(kf_counts)) if kf_counts else 0,
        "n_points_final": slam.arena.n_points(),
        "loops_closed": slam.loop_closer.n_loops_closed,
        "ate_rmse_m": float(rmse),
        "wall_s": wall_s,
        "host_ms_median_thirds": [med(host_ms[:third]),
                                  med(host_ms[third:2 * third]),
                                  med(host_ms[2 * third:])],
        "loop_stats": dict(slam.loop_closer.stats),
        "chain_stats": dict(slam.tracker.chain_stats),
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        # The reference artifact's exact export surface: KITTI 3x4 rows,
        # one per frame, through-culled-references (src/System.cc:398-451).
        slam.save_trajectory_kitti(os.path.join(out_dir,
                                                "CameraTrajectory.txt"))
        slam.save_keyframe_trajectory_tum(
            os.path.join(out_dir, "KeyFrameTrajectory.txt"))
        with open(os.path.join(out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return slam, summary


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 4000
    out = args[1] if len(args) > 1 else None
    run(n, out, async_mapping="--async" in sys.argv)
