"""Arena replace-link following, stereo serialization, ROS image decoding."""

import numpy as np

from orb_slam_system_tpu.mapping.arena import FrameFeatures, MapArena


def _feats(n=8, stereo=False):
    return FrameFeatures(
        xy=np.zeros((n, 2), np.float32),
        xy_und=np.zeros((n, 2), np.float32),
        response=np.zeros(n, np.float32),
        angle=np.zeros(n, np.float32),
        octave=np.zeros(n, np.int32),
        desc=np.zeros((n, 8), np.uint32),
        valid=np.ones(n, bool),
        u_right=(np.arange(n, dtype=np.float32) if stereo else None),
        depth=(np.arange(n, dtype=np.float32) + 1 if stereo else None),
    )


def test_replaced_by_chain_followed_in_last_frame():
    """CheckReplacedInLastFrame follows multi-hop Replace() links
    (reference src/MapPoint.cc:153-190): the last frame keeps its
    association to the surviving point after fusions."""
    from types import SimpleNamespace

    from orb_slam_system_tpu.models.tracking import Tracker

    arena = MapArena()
    kf = arena.new_keyframe(0, 0.0, np.eye(4, dtype=np.float32), _feats())
    a = arena.new_point(np.zeros(3, np.float32), np.zeros(8, np.uint32),
                        kf.id, kf.id)
    b = arena.new_point(np.ones(3, np.float32), np.zeros(8, np.uint32),
                        kf.id, kf.id)
    c = arena.new_point(2 * np.ones(3, np.float32), np.zeros(8, np.uint32),
                        kf.id, kf.id)
    arena.add_observation(a, kf, 0)
    arena.add_observation(b, kf, 1)
    arena.add_observation(c, kf, 2)
    # Two-hop chain: a -> b -> c.
    arena.replace_point(a, b)
    arena.replace_point(b, c)
    assert a.id not in arena.mps and b.id not in arena.mps

    frame = SimpleNamespace(mp_ids=np.asarray([a.id, b.id, c.id, 999],
                                              np.int64))
    host = SimpleNamespace(arena=arena)
    Tracker._replace_updated_points(host, frame)
    assert frame.mp_ids[0] == c.id      # followed a -> b -> c
    assert frame.mp_ids[1] == c.id      # followed b -> c
    assert frame.mp_ids[2] == c.id      # untouched (still alive)
    assert frame.mp_ids[3] == -1        # unknown id drops


def test_serialize_preserves_stereo_channels(tmp_path):
    """u_right/depth round-trip so resumed maps keep their 3-component
    stereo observation edges (advisor finding on serialize.py)."""
    from orb_slam_system_tpu.mapping.serialize import load_map, save_map

    arena = MapArena()
    kf = arena.new_keyframe(0, 0.0, np.eye(4, dtype=np.float32),
                            _feats(stereo=True))
    mp = arena.new_point(np.asarray([0, 0, 2.0], np.float32),
                         np.zeros(8, np.uint32), kf.id, kf.id)
    arena.add_observation(mp, kf, 3)
    p = tmp_path / "map.npz"
    save_map(arena, str(p))
    back = load_map(str(p))
    f = back.kfs[kf.id].feats
    assert f.u_right is not None and f.depth is not None
    np.testing.assert_allclose(f.u_right[:8], np.arange(8))
    np.testing.assert_allclose(f.depth[:8], np.arange(8) + 1)

    # Mono maps stay mono (no phantom stereo channels).
    arena2 = MapArena()
    arena2.new_keyframe(0, 0.0, np.eye(4, dtype=np.float32), _feats())
    p2 = tmp_path / "map2.npz"
    save_map(arena2, str(p2))
    f2 = load_map(str(p2)).kfs[0].feats
    assert f2.u_right is None and f2.depth is None


def test_ros_image_decoding():
    from types import SimpleNamespace

    from orb_slam_system_tpu.dataio.ros_bridge import (
        RosMonoBridge, decode_image_msg)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(6, 9), dtype=np.uint8)

    def msg(enc, data, step):
        return SimpleNamespace(height=6, width=9, encoding=enc,
                               step=step, data=data)

    out = decode_image_msg(msg("mono8", img.tobytes(), 9))
    np.testing.assert_array_equal(out, img.astype(np.float32))

    # Padded row stride.
    padded = np.concatenate([img, np.zeros((6, 3), np.uint8)], axis=1)
    out = decode_image_msg(msg("mono8", padded.tobytes(), 12))
    np.testing.assert_array_equal(out, img.astype(np.float32))

    rgb = np.stack([img, img // 2, img // 3], axis=-1)
    out = decode_image_msg(msg("rgb8", rgb.tobytes(), 27))
    exp = 0.299 * img + 0.587 * (img // 2) + 0.114 * (img // 3)
    np.testing.assert_allclose(out, exp.astype(np.float32), atol=1e-4)

    bgr = rgb[..., ::-1].copy()
    out_bgr = decode_image_msg(msg("bgr8", bgr.tobytes(), 27))
    np.testing.assert_allclose(out_bgr, out, atol=1e-4)

    f32 = (img.astype(np.float32) / 3.0)
    out = decode_image_msg(msg("32FC1", f32.tobytes(), 36))
    np.testing.assert_allclose(out, f32)

    # The bridge surface accepts the decoded frame.
    calls = []
    bridge = RosMonoBridge(SimpleNamespace(
        track_monocular=lambda im, ts: calls.append((im.shape, ts))))
    bridge.on_image(out, 1.5)
    assert calls == [((6, 9), 1.5)]
