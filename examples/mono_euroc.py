"""Monocular EuRoC driver (reference Examples/Monocular/mono_euroc.cc).

Usage: python examples/mono_euroc.py path_to_vocabulary path_to_settings \
       path_to_cam0_dir path_to_timestamp_file [--no-realtime]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from _driver_util import make_fetcher, print_timing_report  # noqa: E402


def main():
    if len(sys.argv) < 5:
        print(__doc__)
        sys.exit(1)
    voc_path = None if sys.argv[1].lower() == "none" else sys.argv[1]
    settings, cam_dir, ts_file = sys.argv[2], sys.argv[3], sys.argv[4]
    realtime = "--no-realtime" not in sys.argv

    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.datasets import load_euroc, load_image_gray
    from orb_slam_system_tpu.models.system import System

    paths, times = load_euroc(cam_dir, ts_file)
    print(f"Images in the sequence: {len(paths)}")
    slam = System(voc_path, settings, Sensor.MONOCULAR)
    track_times = []
    fetch = make_fetcher(paths)
    for i, (p, t) in enumerate(zip(paths, times)):
        img = fetch(i)
        t0 = time.perf_counter()
        slam.track_monocular(img, t)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if realtime and i + 1 < len(paths):
            wait = times[i + 1] - t - dt
            if wait > 0:
                time.sleep(wait)
    slam.shutdown()
    print_timing_report(track_times)
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")


if __name__ == "__main__":
    main()
