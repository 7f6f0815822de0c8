"""Stereo ROS node (reference Examples/ROS/ORB_SLAM2/src/ros_stereo.cc).

Synchronizes /camera/left/image_raw + /camera/right/image_raw
(approximate time), optionally rectifies on the fly from the settings'
LEFT/RIGHT calibration blocks (reference :72-108), tracks, and saves
CameraTrajectory.txt on shutdown.

Usage: python examples/ros_stereo.py vocab settings do_rectify(true|false)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None, rospy_module=None, image_cls=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3:
        print("Usage: ros_stereo.py path_to_vocabulary path_to_settings "
              "do_rectify", file=sys.stderr)
        return 1
    from orb_slam_system_tpu.config import Sensor, load_settings
    from orb_slam_system_tpu.dataio.ros_bridge import (
        RosStereoBridge, attach_rospy_pair)
    from orb_slam_system_tpu.models.system import System

    voc = None if argv[0].lower() == "none" else argv[0]
    do_rectify = argv[2].lower() == "true"
    cfg = load_settings(argv[1], Sensor.STEREO)
    preprocess = None
    if do_rectify:
        if cfg.rect_left is None or cfg.rect_right is None:
            print("ERROR: Calibration parameters to rectify stereo are "
                  "missing!", file=sys.stderr)
            return 1
        from examples.stereo_euroc import build_rectify_map, remap_bilinear
        W, H = cfg.camera.width, cfg.camera.height
        lx, ly = build_rectify_map(
            cfg.rect_left["K"], cfg.rect_left["D"], cfg.rect_left["R"],
            cfg.rect_left["P"], W, H)
        rx, ry = build_rectify_map(
            cfg.rect_right["K"], cfg.rect_right["D"], cfg.rect_right["R"],
            cfg.rect_right["P"], W, H)

        def preprocess(l_img, r_img):  # noqa: F811
            return (remap_bilinear(l_img, lx, ly),
                    remap_bilinear(r_img, rx, ry))

    slam = System(voc, cfg, Sensor.STEREO, async_mapping=True)
    bridge = RosStereoBridge(slam)
    rospy = rospy_module
    if rospy is None:
        import rospy  # noqa: deferred, optional dependency
    attach_rospy_pair(bridge, "/camera/left/image_raw",
                      "/camera/right/image_raw", node_name="Stereo",
                      rospy_module=rospy, image_cls=image_cls,
                      preprocess=preprocess)
    rospy.spin()
    slam.shutdown()
    slam.save_trajectory_tum("CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
