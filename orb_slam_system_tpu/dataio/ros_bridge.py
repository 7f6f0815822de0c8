"""ROS-style bridge adapters (dependency-gated).

The reference ships 4 ROS nodes (Examples/ROS/ORB_SLAM2/src/ros_{mono,rgbd,
stereo}.cc + the AR demo) that subscribe to image topics and call the
System per message. This module provides the same callback-shaped surface:
construct a bridge with a System, hand its `on_*` methods to any message
source (rospy subscriber, rosbag reader, or a test harness). rospy itself
is optional — `attach_rospy` only imports it on use.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class RosMonoBridge:
    """Reference ros_mono.cc: subscribes /camera/image_raw (:64), calls
    TrackMonocular per message."""

    def __init__(self, system):
        self.system = system

    def on_image(self, img: np.ndarray, stamp_sec: float):
        return self.system.track_monocular(img, stamp_sec)


class RosStereoBridge:
    """Reference ros_stereo.cc: synchronized left/right image topics."""

    def __init__(self, system):
        self.system = system

    def on_images(self, left: np.ndarray, right: np.ndarray, stamp_sec: float):
        return self.system.track_stereo(left, right, stamp_sec)


class RosRGBDBridge:
    """Reference ros_rgbd.cc: synchronized rgb + depth topics."""

    def __init__(self, system):
        self.system = system

    def on_images(self, rgb: np.ndarray, depth: np.ndarray, stamp_sec: float):
        return self.system.track_rgbd(rgb, depth, stamp_sec)


def attach_rospy(bridge, image_topic: str = "/camera/image_raw",
                 node_name: str = "orb_slam_tpu"):
    """Wire a RosMonoBridge to a live rospy subscriber (requires rospy +
    cv_bridge at runtime; import-gated so the package has no hard ROS dep)."""
    import rospy  # noqa: deferred, optional dependency
    from cv_bridge import CvBridge
    cvb = CvBridge()

    def cb(msg):
        img = cvb.imgmsg_to_cv2(msg, desired_encoding="mono8")
        bridge.on_image(np.asarray(img, np.float32), msg.header.stamp.to_sec())

    rospy.init_node(node_name, anonymous=True)
    return rospy.Subscriber(image_topic, type(None), cb)
