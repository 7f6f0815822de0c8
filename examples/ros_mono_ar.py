"""Monocular AR ROS node (reference Examples/ROS/ORB_SLAM2/src/AR/
ros_mono_ar.cc + ViewerAR.cc): tracks /camera/image_raw, fits a dominant
plane to the map, and renders the anchored virtual cube into each frame
(models/ar.ARDemo). Annotated frames are written to --out_dir (the
reference shows them in a Pangolin window; this node is headless).

Usage: python examples/ros_mono_ar.py vocab settings [--out_dir DIR]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None, rospy_module=None, image_cls=None):
    argv = sys.argv[1:] if argv is None else argv
    flags = [a for a in argv if a.startswith("--")]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        print("Usage: ros_mono_ar.py path_to_vocabulary path_to_settings "
              "[--out_dir DIR]", file=sys.stderr)
        return 1
    out_dir = None
    for f in flags:
        if f.startswith("--out_dir="):
            out_dir = f.split("=", 1)[1]
    from orb_slam_system_tpu.config import Sensor
    from orb_slam_system_tpu.dataio.ros_bridge import (
        decode_image_msg, _import_rospy)
    from orb_slam_system_tpu.models.ar import ARDemo
    from orb_slam_system_tpu.models.system import System

    voc = None if args[0].lower() == "none" else args[0]
    slam = System(voc, args[1], Sensor.MONOCULAR, async_mapping=True)
    demo = ARDemo(slam)
    rospy, Image = _import_rospy(rospy_module, image_cls)
    n_saved = [0]

    def cb(msg):
        overlay = demo.process(decode_image_msg(msg),
                               msg.header.stamp.to_sec())
        if out_dir is not None:
            from orb_slam_system_tpu.models.viewer import write_pgm
            os.makedirs(out_dir, exist_ok=True)
            write_pgm(
                os.path.join(out_dir, f"ar_{n_saved[0]:06d}.pgm"), overlay)
            n_saved[0] += 1

    rospy.init_node("MonoAR", anonymous=True)
    rospy.Subscriber("/camera/image_raw", Image, cb, queue_size=1)
    rospy.spin()
    slam.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
