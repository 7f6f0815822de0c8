"""Stereo KITTI driver (reference Examples/Stereo/stereo_kitti.cc:39-125).

Usage: python examples/stereo_kitti.py path_to_vocabulary path_to_settings \
       path_to_sequence_dir [--no-realtime]

Writes CameraTrajectory.txt in KITTI format (:125).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from _driver_util import make_fetcher, print_timing_report  # noqa: E402


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    voc_path = None if sys.argv[1].lower() == "none" else sys.argv[1]
    settings, seq_dir = sys.argv[2], sys.argv[3]
    realtime = "--no-realtime" not in sys.argv

    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.datasets import load_image_gray, load_kitti
    from orb_slam_system_tpu.models.system import System

    left, right, times = load_kitti(seq_dir, stereo=True)
    print(f"Images in the sequence: {len(left)}")
    slam = System(voc_path, settings, Sensor.STEREO)
    track_times = []
    fetch_l = make_fetcher(left)
    fetch_r = make_fetcher(right)
    for i, t in enumerate(times):
        l_img = fetch_l(i)
        r_img = fetch_r(i)
        t0 = time.perf_counter()
        slam.track_stereo(l_img, r_img, t)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if realtime and i + 1 < len(times):
            wait = times[i + 1] - t - dt
            if wait > 0:
                time.sleep(wait)
    slam.shutdown()
    print_timing_report(track_times)
    slam.save_trajectory_kitti("CameraTrajectory.txt")


if __name__ == "__main__":
    main()
