"""Batched multi-sequence front-end throughput (BASELINE.json config 5:
"batched multi-sequence EuRoC MH01-05 mapping on one chip" — the offline
SfM-style throughput mode).

Runs the sharded multi-sequence step (extraction + MXU matching + pose LM,
dp over sequences / sp over keypoints) over S synthetic sequences and
reports aggregate frames/sec. On a multi-chip mesh the same program scales
over ICI; on one chip the mesh is 1x1.

Usage: python examples/multiseq_throughput.py [n_sequences] [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    n_seq = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax
    import jax.numpy as jnp
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from orb_slam_system_tpu.parallel.multiseq import make_mesh, make_multiseq_step

    H, W = 240, 320
    n_dev = max(len(jax.devices()), 1)
    mesh = make_mesh(n_dev, model_parallel=2 if n_dev % 2 == 0 else 1)
    print(f"mesh: {dict(mesh.shape)} devices={n_dev}")
    step, example = make_multiseq_step(mesh, H, W, n_features=512, n_levels=4)
    S = example[0].shape[0]
    # Render S sequences with different textures.
    K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float32)
    renderers = [
        PlanarSceneRenderer(K, W, H, texture=make_texture(1024, 8, seed=s),
                            tex_scale=220.0)
        for s in range(S)
    ]
    trajs = [orbit_trajectory(n_frames, radius=0.3, depth=-2.0, tilt=0.3)
             for _ in range(S)]
    _, prev_desc, prev_xy, prev_valid, pts, Tcw0 = example
    # Warmup.
    out = step(*example)
    _ = np.asarray(out[1])
    t_total = 0.0
    frames = 0
    for f in range(n_frames):
        imgs = np.stack([renderers[s].render(trajs[s][f]) for s in range(S)])
        t0 = time.perf_counter()
        T, n_in, n_match = step(jnp.asarray(imgs), prev_desc, prev_xy,
                                prev_valid, pts, Tcw0)
        _ = int(n_in)  # sync
        t_total += time.perf_counter() - t0
        frames += S
    print(f"sequences={S} frames={frames} "
          f"aggregate frontend fps={frames / t_total:.1f} "
          f"({t_total / frames * 1000:.1f} ms/frame)")


if __name__ == "__main__":
    main()
