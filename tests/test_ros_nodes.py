"""Runnable ROS node entry points (examples/ros_{mono,stereo,rgbd,mono_ar}
.py) driven through a fake-rospy lifecycle: init_node -> subscribe ->
messages delivered inside spin() -> shutdown -> trajectory saved. Mirrors
the reference node mains (Examples/ROS/ORB_SLAM2/src/ros_mono.cc:64 etc.)
without a ROS installation.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.dataio.ros_bridge import (  # noqa: E402
    ApproxTimeSync, decode_image_msg)


class FakeStamp:
    def __init__(self, t):
        self._t = t

    def to_sec(self):
        return self._t


class FakeHeader:
    def __init__(self, t):
        self.stamp = FakeStamp(t)


class FakeImageMsg:
    """Duck-typed sensor_msgs/Image (mono8)."""

    def __init__(self, img: np.ndarray, t: float):
        u8 = np.clip(img, 0, 255).astype(np.uint8)
        self.height, self.width = u8.shape
        self.step = self.width
        self.encoding = "mono8"
        self.data = u8.tobytes()
        self.header = FakeHeader(t)


class FakeImageMsg32F(FakeImageMsg):
    """32FC1 depth image message."""

    def __init__(self, depth: np.ndarray, t: float):
        d = depth.astype(np.float32)
        self.height, self.width = d.shape
        self.step = self.width * 4
        self.encoding = "32fc1"
        self.data = d.tobytes()
        self.header = FakeHeader(t)


class FakeRospy:
    """Stub of the rospy surface the nodes touch: subscriptions register
    callbacks; spin() drains a preloaded message script."""

    def __init__(self, script):
        # script: list of (topic, msg)
        self.script = script
        self.subs = {}
        self.node_name = None

    def init_node(self, name, anonymous=False):
        self.node_name = name

    def Subscriber(self, topic, msg_cls, cb, queue_size=1):
        self.subs[topic] = cb
        return ("sub", topic)

    def spin(self):
        for topic, msg in self.script:
            cb = self.subs.get(topic)
            assert cb is not None, f"no subscriber for {topic}"
            cb(msg)


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    from examples.mono_synthetic import make_config
    from orb_slam_system_tpu.dataio.synthetic import (
        PlanarSceneRenderer, make_texture, orbit_trajectory)
    from orb_slam_system_tpu.config import save_settings_yaml

    cfg = make_config(n_features=300)
    tex = make_texture(size=1024, block=8, seed=7)
    r = PlanarSceneRenderer(cfg.camera.K, cfg.camera.width,
                            cfg.camera.height, texture=tex, tex_scale=220.0)
    poses = orbit_trajectory(10, radius=0.35, depth=-2.0, tilt=0.3)
    imgs = [r.render(T) for T in poses]
    d = tmp_path_factory.mktemp("ros")
    settings = str(d / "settings.yaml")
    save_settings_yaml(cfg, settings)
    return imgs, settings, d


def test_decode_image_msg_roundtrip():
    img = (np.arange(48, dtype=np.float32).reshape(6, 8) * 5) % 256
    msg = FakeImageMsg(img, 0.0)
    out = decode_image_msg(msg)
    np.testing.assert_allclose(out, np.clip(img, 0, 255).astype(np.uint8))


def test_approx_time_sync_pairs_and_drops():
    got = []
    s = ApproxTimeSync(lambda a, b, t: got.append((a, b, t)), slop=0.02)
    s.add(0, "a0", 0.00)
    s.add(1, "b0", 0.01)     # pairs with a0
    s.add(0, "a1", 0.50)
    s.add(1, "bx", 0.10)     # no partner within slop -> dropped
    s.add(1, "b1", 0.505)    # pairs with a1
    assert got == [("a0", "b0", 0.0), ("a1", "b1", 0.5)]


def test_ros_mono_node_lifecycle(frames, tmp_path, monkeypatch):
    imgs, settings, _ = frames
    from examples import ros_mono

    monkeypatch.chdir(tmp_path)
    script = [("/camera/image_raw", FakeImageMsg(im, i / 30.0))
              for i, im in enumerate(imgs)]
    rospy = FakeRospy(script)
    rc = ros_mono.main(["none", settings], rospy_module=rospy,
                       image_cls=FakeImageMsg)
    assert rc == 0
    assert rospy.node_name == "Mono"
    assert (tmp_path / "KeyFrameTrajectory.txt").exists()


def test_ros_rgbd_node_lifecycle(frames, tmp_path):
    imgs, settings, d = frames
    from examples import ros_rgbd

    os.chdir(tmp_path)
    # Flat synthetic depth (the planar scene sits ~2 m out).
    script = []
    for i, im in enumerate(imgs[:4]):
        t = i / 30.0
        depth = np.full(im.shape, 2.0, np.float32)
        script.append(("/camera/rgb/image_raw", FakeImageMsg(im, t)))
        script.append(("/camera/depth_registered/image_raw",
                       FakeImageMsg32F(depth, t)))
    rospy = FakeRospy(script)
    rc = ros_rgbd.main(["none", settings], rospy_module=rospy,
                       image_cls=FakeImageMsg)
    assert rc == 0
    assert (tmp_path / "CameraTrajectory.txt").exists()


def test_ros_mono_ar_node_lifecycle(frames, tmp_path):
    imgs, settings, _ = frames
    from examples import ros_mono_ar

    out_dir = str(tmp_path / "ar")
    script = [("/camera/image_raw", FakeImageMsg(im, i / 30.0))
              for i, im in enumerate(imgs)]
    rospy = FakeRospy(script)
    rc = ros_mono_ar.main(["none", settings, f"--out_dir={out_dir}"],
                          rospy_module=rospy, image_cls=FakeImageMsg)
    assert rc == 0
    saved = os.listdir(out_dir)
    assert len(saved) == len(imgs)
