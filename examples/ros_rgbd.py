"""RGB-D ROS node (reference Examples/ROS/ORB_SLAM2/src/ros_rgbd.cc).

Synchronizes /camera/rgb/image_raw + /camera/depth_registered/image_raw
(approximate time), tracks, and saves both trajectory files on shutdown.

Usage: python examples/ros_rgbd.py path_to_vocabulary path_to_settings
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None, rospy_module=None, image_cls=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("Usage: ros_rgbd.py path_to_vocabulary path_to_settings",
              file=sys.stderr)
        return 1
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.ros_bridge import (
        RosRGBDBridge, attach_rospy_pair)
    from orb_slam_system_tpu.models.system import System

    voc = None if argv[0].lower() == "none" else argv[0]
    slam = System(voc, argv[1], Sensor.RGBD, async_mapping=True)
    bridge = RosRGBDBridge(slam)
    rospy = rospy_module
    if rospy is None:
        import rospy  # noqa: deferred, optional dependency
    attach_rospy_pair(bridge, "/camera/rgb/image_raw",
                      "/camera/depth_registered/image_raw",
                      node_name="RGBD", rospy_module=rospy,
                      image_cls=image_cls)
    rospy.spin()
    slam.shutdown()
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    slam.save_trajectory_tum("CameraTrajectory.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
