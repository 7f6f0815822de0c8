"""Monocular ROS node (reference Examples/ROS/ORB_SLAM2/src/ros_mono.cc:64).

Subscribes /camera/image_raw, tracks each frame, and on shutdown saves
KeyFrameTrajectory.txt — the reference main's exact lifecycle. rospy is
injectable so the node is testable without ROS (tests/test_ros_nodes.py
drives it with a stub).

Usage: python examples/ros_mono.py path_to_vocabulary path_to_settings
       (vocabulary may be "none": the self-trained fallback engages)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None, rospy_module=None, image_cls=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("Usage: ros_mono.py path_to_vocabulary path_to_settings",
              file=sys.stderr)
        return 1
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.ros_bridge import (
        RosMonoBridge, attach_rospy)
    from orb_slam_system_tpu.models.system import System

    voc = None if argv[0].lower() == "none" else argv[0]
    slam = System(voc, argv[1], Sensor.MONOCULAR, async_mapping=True)
    bridge = RosMonoBridge(slam)
    rospy = rospy_module
    if rospy is None:
        import rospy  # noqa: deferred, optional dependency
    attach_rospy(bridge, "/camera/image_raw", node_name="Mono",
                 rospy_module=rospy, image_cls=image_cls)
    rospy.spin()
    slam.shutdown()
    slam.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    return 0


if __name__ == "__main__":
    sys.exit(main())
