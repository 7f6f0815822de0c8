from orb_slam_system_tpu.utils import lie, camera  # noqa: F401
