"""orb_slam_system_tpu — a TPU-native ORB-SLAM2-class visual SLAM framework.

Built from scratch in JAX/XLA/Pallas against the capability surface of the
reference (WangHewei16/ORB-SLAM-System, an ORB-SLAM2 fork; see SURVEY.md).
The compute path (feature extraction, descriptor matching, RANSAC solvers,
bundle adjustment) runs as batched, statically-shaped device programs; the
sequential SLAM state machine and the map store live on host.

Layering (mirrors SURVEY.md §1, redesigned TPU-first):
  utils/     SE3/Sim3 Lie ops, camera models, profiling
  ops/       device kernels: pyramid, FAST, orientation, rBRIEF, Hamming,
             matching, stereo
  solvers/   batched LM engine: pose optimization, two-view init, EPnP,
             Sim3, local/global BA, essential graph
  mapping/   host-side map arena (keyframes, map points, covisibility)
  models/    Frame, Tracking, LocalMapping, LoopClosing, System facade
  vocab/     bag-of-words vocabulary (DBoW2-equivalent)
  dataio/    dataset readers (TUM/KITTI/EuRoC), trajectory writers, synthetic
  parallel/  device-mesh sharding for batched multi-sequence mapping
"""

__version__ = "0.1.0"

from orb_slam_system_tpu.config import SlamConfig, Sensor  # noqa: F401
