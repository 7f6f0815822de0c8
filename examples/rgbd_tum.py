"""RGB-D TUM driver (reference Examples/RGB-D/rgbd_tum.cc:38-137).

Usage: python examples/rgbd_tum.py path_to_vocabulary path_to_settings \
       path_to_sequence path_to_association [--no-realtime]

Writes CameraTrajectory.txt and KeyFrameTrajectory.txt (:136-137).
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
    settings, seq_dir, assoc = sys.argv[2], sys.argv[3], sys.argv[4]
    realtime = "--no-realtime" not in sys.argv

    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.datasets import (
        load_depth_raw, load_image_gray, load_tum_associations)
    from orb_slam_system_tpu.models.system import System

    rgb, depth, times = load_tum_associations(seq_dir, assoc)
    print(f"Images in the sequence: {len(rgb)}")
    slam = System(voc_path, settings, Sensor.RGBD)
    track_times = []
    fetch_rgb = make_fetcher(rgb)
    fetch_d = make_fetcher(depth, raw16=True)
    for i, t in enumerate(times):
        img = fetch_rgb(i)
        d = fetch_d(i)  # raw 16-bit values; DepthMapFactor scales
        t0 = time.perf_counter()
        slam.track_rgbd(img, d, t)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if realtime and i + 1 < len(times):
            wait = times[i + 1] - t - dt
            if wait > 0:
                time.sleep(wait)
    slam.shutdown()
    print_timing_report(track_times)
    slam.save_trajectory_tum("CameraTrajectory.txt")
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")


if __name__ == "__main__":
    main()
