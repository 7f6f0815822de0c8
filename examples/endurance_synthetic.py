"""KITTI-scale endurance run: 1000+ frames, multi-loop, 300+ keyframe map.

The reference demonstrably ran a 4541-frame KITTI-class sequence
(/root/reference/CameraTrajectory.txt:1-4541); its map scaling story is
windowed local BA + keyframe/map-point culling + the covisibility-capped
local map (SURVEY.md §5 long-context row). This driver exercises exactly
those mechanisms at scale on synthetic imagery with known ground truth:

  * Trajectory: a four-leaf "clover" of circles tangent at the origin —
    the camera traverses each ~11 m circle and returns to the shared
    junction, so loop closure can fire at every circle transition
    (>=2 closures expected; KITTI 00's revisit structure in miniature).
  * A degraded (blur + noise) segment in the middle of each circle
    accumulates real drift for the closures to correct.
  * Profiling: per-frame host wall time and LocalMapper.stage_ms are
    recorded in thirds so growth with map size is measurable — the gate
    is that keyframe-stage time and per-frame host time stay BOUNDED
    (not linear in keyframes) as the map passes 300 keyframes.

Usage: python examples/endurance_synthetic.py [n_frames] [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def clover_trajectory(n_frames: int, radius: float = 1.8,
                      depth: float = -2.0, tilt: float = 0.3,
                      leaves: int = 4):
    """Circles tangent at the origin, headings 90° apart; each traversed
    once, starting and ending at the junction."""
    ct, st_ = np.cos(tilt), np.sin(tilt)
    R_tilt = np.array([[1.0, 0.0, 0.0], [0.0, ct, -st_], [0.0, st_, ct]])
    R = R_tilt.T
    per = n_frames // leaves
    poses = []
    for i in range(n_frames):
        leaf = min(i // per, leaves - 1)
        a = 2 * np.pi * (i - leaf * per) / per
        th = leaf * (2 * np.pi / leaves)
        cx, cy = radius * np.cos(th), radius * np.sin(th)
        px = cx - radius * np.cos(th + a)
        py = cy - radius * np.sin(th + a)
        C = np.array([px, py, depth])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = -R @ C
        poses.append(T)
    return poses


def _blur(img, sigma):
    from examples.loop_synthetic import blur
    return blur(img, sigma)


def run(n_frames=1000, out_json=None, verbose=True, n_features=400,
        noise=3.5, blur_sigma=1.5, async_mapping=False, leaves=4,
        pipelined=False):
    from examples.mono_synthetic import make_config
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture)
    from orb_slam_system_tpu.dataio import trajectory as traj_io
    from orb_slam_system_tpu.models.system import System

    cfg = make_config(n_features=n_features)
    # Texture sized to the clover extent (~±4.5 m needs ~18 m of unique
    # texture; the renderer clamps outside, which would kill features).
    tex = make_texture(size=4096, block=8, seed=7)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width, cfg.camera.height,
                            texture=tex, tex_scale=220.0)
    # ~250 frames per 11.3 m circle = ~4.5 cm/frame at the real scale;
    # smoke runs shrink `leaves` (not per-frame motion) to stay short.
    poses = clover_trajectory(n_frames, leaves=leaves)
    slam = System(None, cfg, Sensor.MONOCULAR, async_mapping=async_mapping)
    if os.environ.get("ORB_SLAM_LOOP_DEBUG") == "1":
        slam.loop_closer.debug = True
    if os.environ.get("ORB_SLAM_CHAIN_CLASSIC_KF") == "1":
        slam.tracker.chain_classic_kf = True
    if os.environ.get("ORB_SLAM_KF_ASYNC_QUEUE"):
        v = os.environ["ORB_SLAM_KF_ASYNC_QUEUE"]
        slam.tracker.kf_async_queue = None if v == "none" else int(v)
    if os.environ.get("ORB_SLAM_KF_ASYNC_WAIT"):
        slam.tracker.kf_async_wait_s = float(
            os.environ["ORB_SLAM_KF_ASYNC_WAIT"])
    if os.environ.get("ORB_SLAM_KF_SYNC_FLUSH"):
        slam.tracker.kf_sync_flush_ratio = float(
            os.environ["ORB_SLAM_KF_SYNC_FLUSH"])
    if os.environ.get("ORB_SLAM_KF_DRAIN_RELEASE"):
        slam.tracker.kf_drain_release_on_expansion = (
            os.environ["ORB_SLAM_KF_DRAIN_RELEASE"] == "1")
    rng = np.random.default_rng(1)
    per = n_frames // leaves
    gt = {}
    host_ms = []
    kf_counts = []
    loop_counts = []
    t_start = time.perf_counter()

    def make_frame(i, Tcw):
        ts = i / 30.0
        img = r.render(Tcw)
        frac = (i % per) / per
        if 0.25 <= frac <= 0.6:   # degraded mid-circle segment
            img = _blur(img, blur_sigma).astype(np.float32) + \
                rng.normal(size=img.shape).astype(np.float32) * noise
        R3 = Tcw[:3, :3]
        gt[ts] = (-R3.T @ Tcw[:3, 3]).astype(np.float64)
        return img, ts

    def note(i, t0):
        host_ms.append((time.perf_counter() - t0) * 1e3)
        kf_counts.append(slam.arena.n_keyframes())
        loop_counts.append(slam.loop_closer.n_loops_closed)
        if verbose and i % 25 == 0:
            print(f"frame {i:4d} {slam.get_tracking_state().name:16s} "
                  f"kfs={kf_counts[-1]:4d} mps={slam.arena.n_points():5d} "
                  f"loops={loop_counts[-1]} host={host_ms[-1]:.0f}ms",
                  flush=True)

    if pipelined:
        # Deep-pipelined device-state mode over the full clover — the
        # realtime path exercised at map scale (keyframe culling, loop
        # closures, relocalizations all happen mid-pipeline). Host time
        # per frame here includes the render (the generator runs inside
        # the pipeline's pull loop).
        def gen():
            for i, Tcw in enumerate(poses):
                yield make_frame(i, Tcw)
        t0 = time.perf_counter()
        for i, _ in enumerate(slam.track_monocular_pipelined(gen())):
            note(i, t0)
            t0 = time.perf_counter()
    else:
        for i, Tcw in enumerate(poses):
            img, ts = make_frame(i, Tcw)
            t0 = time.perf_counter()
            slam.track_monocular(img, ts)
            note(i, t0)
    slam.shutdown()
    wall_s = time.perf_counter() - t_start
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    rmse = traj_io.ate_rmse(est, gt)
    n_tracked = sum(1 for _, _, lost in est if not lost)

    # Host-time growth profile by thirds (drop each frame's render time;
    # medians are robust to keyframe spikes).
    third = n_frames // 3
    med = lambda xs: float(np.median(xs)) if len(xs) else 0.0  # noqa: E731
    profile = {
        "host_ms_median_thirds": [med(host_ms[:third]),
                                  med(host_ms[third:2 * third]),
                                  med(host_ms[2 * third:])],
        "host_ms_p90_thirds": [
            float(np.percentile(host_ms[:third], 90)),
            float(np.percentile(host_ms[third:2 * third], 90)),
            float(np.percentile(host_ms[2 * third:], 90))],
        "stage_ms_first20_mean": {
            k: float(np.mean(list(v)[:20]))
            for k, v in slam.local_mapper.stage_ms.history.items()},
        "stage_ms_last20_mean": {
            k: float(np.mean(list(v)[-20:]))
            for k, v in slam.local_mapper.stage_ms.history.items()},
    }
    summary = {
        "n_frames": n_frames,
        "n_tracked": n_tracked,
        "n_keyframes_final": slam.arena.n_keyframes(),
        "n_keyframes_peak": int(max(kf_counts)),
        "n_points_final": slam.arena.n_points(),
        "loops_closed": int(loop_counts[-1]),
        "ate_rmse_m": float(rmse),
        "wall_s": wall_s,
        "loop_stats": dict(slam.loop_closer.stats),
        "chain_stats": dict(slam.tracker.chain_stats),
        "reloc_stats": dict(slam.tracker.reloc_stats),
        "kf_wait_stats": dict(slam.tracker.kf_wait_stats),
        # Median per-keyframe associated-point count (thin keyframes
        # starve the loop pipeline's KF-to-KF BoW matching).
        "kf_mp_median": float(np.median(
            [int((kf.mp_ids >= 0).sum()) for kf in slam.arena.kfs.values()]
        )) if slam.arena.kfs else 0.0,
        **profile,
    }
    print(json.dumps(summary, indent=2))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=2)
    return slam, summary


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 1000
    out = args[1] if len(args) > 1 else None
    leaves = int(args[2]) if len(args) > 2 else 4
    run(n, out, leaves=leaves,
        pipelined="--pipe" in sys.argv,
        async_mapping="--async" in sys.argv)
