"""Batched multi-sequence SLAM throughput (BASELINE.json config 5:
"batched multi-sequence EuRoC MH01-05 mapping on one chip").

Default mode runs S COMPLETE SLAM systems (tracking + local mapping +
loop closing each) over S distinct synthetic sequences, with the per-frame
extraction collapsed into ONE batched device program shared across
sequences (parallel/multi_system.MultiSystem). Writes one TUM trajectory
per sequence and reports aggregate frames/sec + per-sequence ATE.

`--frontend` runs the older sharded front-end-only step (dp over
sequences x sp over keypoints on a device mesh, parallel/multiseq.py) —
the multi-chip scaling microbenchmark used by dryrun_multichip.

Usage: python examples/multiseq_throughput.py [n_sequences] [n_frames]
       [out_dir] [--frontend]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def run_full(n_seq: int = 4, n_frames: int = 40, out_dir: str = ".",
             n_features: int = 400, verbose: bool = True):
    from orb_slam_system_tpu.config import (
        CameraConfig, ORBConfig, SlamConfig, Sensor, TrackingState)
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from orb_slam_system_tpu.dataio import trajectory as traj_io
    from orb_slam_system_tpu.parallel.multi_system import MultiSystem

    W, H = 320, 240
    cam = CameraConfig(fx=260.0, fy=260.0, cx=W / 2, cy=H / 2, fps=30.0,
                       width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=n_features),
                     sensor=Sensor.MONOCULAR)
    renderers = [
        PlanarSceneRenderer(cam.K, W, H,
                            texture=make_texture(2048, 8, seed=7 + s),
                            tex_scale=220.0)
        for s in range(n_seq)
    ]
    trajs = [orbit_trajectory(n_frames, radius=0.30 + 0.02 * s, depth=-2.0,
                              tilt=0.3) for s in range(n_seq)]
    ms = MultiSystem(cfg, n_seq)
    gts = [dict() for _ in range(n_seq)]
    for i in range(n_frames):
        ts = i / 30.0
        imgs = np.stack([renderers[s].render(trajs[s][i])
                         for s in range(n_seq)])
        ms.track_batch(imgs, ts)
        for s in range(n_seq):
            T = trajs[s][i]
            gts[s][ts] = (-T[:3, :3].T @ T[:3, 3]).astype(np.float64)
        if verbose and i % 10 == 0:
            states = "".join(
                sy.get_tracking_state().name[0] for sy in ms.systems)
            print(f"frame {i:3d} states={states} "
                  f"kfs={[sy.arena.n_keyframes() for sy in ms.systems]}",
                  flush=True)
    ms.shutdown()
    fps = ms.aggregate_fps()
    ates = []
    for s, sy in enumerate(ms.systems):
        est = traj_io.frame_poses(sy.arena, sy.tracker.trajectory)
        rmse = traj_io.ate_rmse(est, gts[s])
        ates.append(rmse)
        sy.save_trajectory_tum(
            os.path.join(out_dir, f"CameraTrajectory_seq{s}.txt"))
    n_ok = sum(1 for sy in ms.systems
               if sy.get_tracking_state() == TrackingState.OK)
    print(f"sequences={n_seq} frames/seq={n_frames} "
          f"aggregate fps={fps:.1f} ok_final={n_ok}/{n_seq}")
    print("ATE per sequence (cm): "
          + " ".join(f"{a * 100:.2f}" for a in ates))
    return ms, ates, fps


def run_frontend(n_seq: int = 8, n_frames: int = 20):
    import jax
    import jax.numpy as jnp
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from orb_slam_system_tpu.parallel.multiseq import (
        make_mesh, make_multiseq_step)

    H, W = 240, 320
    n_dev = max(len(jax.devices()), 1)
    mesh = make_mesh(n_dev, model_parallel=2 if n_dev % 2 == 0 else 1)
    print(f"mesh: {dict(mesh.shape)} devices={n_dev}")
    step, example = make_multiseq_step(mesh, H, W, n_features=512,
                                       n_levels=4)
    S = example[0].shape[0]
    K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]],
                 np.float32)
    renderers = [
        PlanarSceneRenderer(K, W, H, texture=make_texture(1024, 8, seed=s),
                            tex_scale=220.0)
        for s in range(S)
    ]
    trajs = [orbit_trajectory(n_frames, radius=0.3, depth=-2.0, tilt=0.3)
             for _ in range(S)]
    _, prev_desc, prev_valid, pts, Tcw0 = example
    out = step(*example)
    _ = np.asarray(out[1])
    t_total = 0.0
    frames = 0
    for f in range(n_frames):
        imgs = np.stack([renderers[s].render(trajs[s][f]) for s in range(S)])
        t0 = time.perf_counter()
        T, n_in, n_match = step(jnp.asarray(imgs), prev_desc,
                                prev_valid, pts, Tcw0)
        _ = int(n_in)  # sync
        t_total += time.perf_counter() - t0
        frames += S
    print(f"sequences={S} frames={frames} "
          f"aggregate frontend fps={frames / t_total:.1f} "
          f"({t_total / frames * 1000:.1f} ms/frame)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_seq = int(args[0]) if len(args) > 0 else 4
    n_frames = int(args[1]) if len(args) > 1 else 40
    out_dir = args[2] if len(args) > 2 else "."
    if "--frontend" in sys.argv:
        run_frontend(n_seq, n_frames)
    else:
        run_full(n_seq, n_frames, out_dir)
