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

import os as _os


def _honor_cpu_request():
    """Make `JAX_PLATFORM_NAME=cpu` reliable even when a PJRT plugin's
    site hook re-exports JAX_PLATFORMS after the environment was set (on
    this dev image the axon TPU-tunnel plugin does exactly that, so env
    vars alone can leave example drivers running eagerly over the remote
    tunnel). jax.config wins over both."""
    want = (_os.environ.get("JAX_PLATFORM_NAME")
            or _os.environ.get("ORB_SLAM_TPU_PLATFORM"))
    if not want:
        return
    try:
        import jax
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:  # noqa: BLE001 — platform forcing is best-effort
        pass


_honor_cpu_request()


def _enable_compilation_cache():
    """Persist XLA compilations across processes (the SLAM pipeline traces
    ~100 programs; cold starts drop from minutes to seconds on reruns).
    Opt out with ORB_SLAM_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("ORB_SLAM_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache",
                          "orb_slam_tpu_xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()

from orb_slam_system_tpu.config import SlamConfig, Sensor  # noqa: F401, E402
