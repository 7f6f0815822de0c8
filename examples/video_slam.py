"""Video / image-directory monocular driver.

Covers the reference's `myvideo` (Examples/Monocular/upload_ri_video.cpp:
mp4 -> resize 1280x720 -> TrackMonocular) and `myslam`
(laptop_camera.cpp: live cv::VideoCapture(0)) without an OpenCV dependency:
  * a directory (or glob) of frames is consumed in filename order with
    wall-clock-style timestamps at the configured fps;
  * if ffmpeg is on PATH, an mp4/mov path is decoded by piping rawvideo
    grayscale frames (the video path); live-camera capture requires a
    device and is out of scope for this environment.

Usage: python examples/video_slam.py path_to_vocabulary path_to_settings \
       video_or_directory [fps]
"""

import glob
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def iter_directory(path, fps):
    from orb_slam_system_tpu.dataio.datasets import load_image_gray
    files = sorted(glob.glob(os.path.join(path, "*")))
    for i, f in enumerate(files):
        try:
            yield load_image_gray(f), i / fps
        except (ValueError, RuntimeError):
            continue


def iter_video(path, fps, width, height):
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not available for video decoding")
    cmd = ["ffmpeg", "-i", path, "-f", "rawvideo", "-pix_fmt", "gray",
           "-s", f"{width}x{height}", "-loglevel", "quiet", "-"]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    i = 0
    frame_bytes = width * height
    while True:
        buf = proc.stdout.read(frame_bytes)
        if len(buf) < frame_bytes:
            break
        yield np.frombuffer(buf, np.uint8).reshape(height, width).astype(
            np.float32), i / fps
        i += 1
    proc.wait()


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    voc_path = None if sys.argv[1].lower() == "none" else sys.argv[1]
    settings, src = sys.argv[2], sys.argv[3]
    fps = float(sys.argv[4]) if len(sys.argv) > 4 else 30.0

    from orb_slam_system_tpu.config import Sensor, load_settings
    from orb_slam_system_tpu.models.system import System

    cfg = load_settings(settings, Sensor.MONOCULAR)
    slam = System(voc_path, cfg, Sensor.MONOCULAR)
    frames = (iter_directory(src, fps) if os.path.isdir(src)
              else iter_video(src, fps, cfg.camera.width, cfg.camera.height))
    n = 0
    for img, t in frames:
        slam.track_monocular(img, t)
        n += 1
        if n % 30 == 0:
            print(f"frame {n}: state={slam.get_tracking_state().name} "
                  f"kfs={slam.arena.n_keyframes()}", flush=True)
    slam.shutdown()
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    print(f"processed {n} frames")


if __name__ == "__main__":
    main()
