"""Async local-mapping thread (System(async_mapping=True)).

The reference runs LocalMapping on its own thread (src/System.cc:65-70 +
src/LocalMapping.cc:28-53); async mode reproduces that: keyframes queue to
a worker, tracking overlaps mapping via arena.lock/arena.unlocked. These
tests gate that the threaded pipeline tracks a synthetic sequence to the
same quality bar as the synchronous mode and shuts down cleanly.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from orb_slam_system_tpu.config import (  # noqa: E402
    CameraConfig, ORBConfig, Sensor, SlamConfig, TrackingState)
from orb_slam_system_tpu.dataio.synthetic import (  # noqa: E402
    PlanarSceneRenderer, make_texture, orbit_trajectory)
from orb_slam_system_tpu.dataio import trajectory as traj_io  # noqa: E402
from orb_slam_system_tpu.models.system import System  # noqa: E402


def _run(async_mapping, n_frames=22):
    W, H = 640, 480
    cam = CameraConfig(fx=520.0, fy=520.0, cx=W / 2, cy=H / 2, fps=30.0,
                       width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=400),
                     sensor=Sensor.MONOCULAR)
    r = PlanarSceneRenderer(cam.K, W, H, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(n_frames, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.MONOCULAR, async_mapping=async_mapping)
    gt = {}
    for i, Tcw in enumerate(poses):
        ts = i / 30.0
        slam.track_monocular(r.render(Tcw), ts)
        R = Tcw[:3, :3]
        gt[ts] = (-R.T @ Tcw[:3, 3]).astype(np.float64)
    slam.shutdown()
    est = traj_io.frame_poses(slam.arena, slam.tracker.trajectory)
    rmse = traj_io.ate_rmse(est, gt)
    return slam, rmse


def test_async_mapping_tracks_and_maps():
    slam, rmse = _run(async_mapping=True)
    assert slam.get_tracking_state() == TrackingState.OK
    assert slam.arena.n_keyframes() >= 3
    assert slam.arena.n_points() > 150
    assert rmse < 0.03
    # Worker is stopped and the queue drained after shutdown.
    assert not slam.local_mapper.queue
    assert slam.local_mapper._thread is None


def test_async_quality_matches_sync():
    _, rmse_async = _run(async_mapping=True)
    _, rmse_sync = _run(async_mapping=False)
    # Interleaving changes keyframe timing, so results aren't bit-equal;
    # both modes must hit the same centimeter-class bar.
    assert rmse_sync < 0.03 and rmse_async < 0.03


def test_worker_batch_guarantees_ba_per_batch():
    """The round-5 worker restructure: local BA + keyframe culling run
    once per EXPANSION BATCH, guaranteed, even when the tracker refills
    the queue before the refinement phase. The round-4 drain-release A/B
    failed precisely because BA/culling were gated on an empty queue and
    starved under ~1 KF/frame demand (docs/ROADMAP.md
    'Drain-release-on-expansion A/B')."""
    slam, _ = _run(async_mapping=False, n_frames=14)
    mapper = slam.local_mapper
    kf_ids = list(slam.arena.kfs)
    assert len(kf_ids) >= 2 and slam.arena.n_keyframes() > 2
    calls = {"ba": 0, "cull": 0, "tri": 0}

    def fake_tri(kf, do_fuse=True):
        calls["tri"] += 1

    def fake_ba(kf):
        calls["ba"] += 1
        if calls["ba"] == 1:
            # Tracker refills the queue mid-refinement: the next batch
            # must STILL get its own BA pass.
            mapper.queue.append(kf_ids[1])

    mapper.tri_and_fuse = fake_tri
    mapper.local_ba = fake_ba
    mapper.cull_keyframes = lambda kf: calls.__setitem__(
        "cull", calls["cull"] + 1)
    mapper.queue.clear()
    mapper.queue.append(kf_ids[0])
    mapper.process_pending()
    assert not mapper.queue
    assert calls["tri"] == 2          # both keyframes expanded
    assert calls["ba"] == 2           # one BA per batch, refill included
    assert calls["cull"] == 2
    assert mapper._expanding is False
    slam.shutdown()


def test_expanding_cleared_on_exception():
    """Advisor r4: an exception inside a sync-mode process_pending call
    must not leave _expanding stuck True (every later backpressure drain
    would wait out the full kf_async_wait_s timeout per frame)."""
    slam, _ = _run(async_mapping=False, n_frames=14)
    mapper = slam.local_mapper
    kf_ids = list(slam.arena.kfs)

    def boom(kf):
        raise RuntimeError("injected")

    mapper.process_new_keyframe = boom
    mapper.queue.append(kf_ids[0])
    try:
        mapper.process_pending()
    except RuntimeError:
        pass
    assert mapper._expanding is False
    mapper.queue.clear()
    slam.shutdown()


def test_internal_reset_under_lock_does_not_deadlock():
    """Tracker.reset() fired from inside the locked tracking section
    (the ≤5-KF lost path, tracking.py _track_locked) must release
    arena.lock around the worker flush — otherwise the worker's stages
    block on the lock and flush spins for its whole timeout (advisor r2
    high finding)."""
    import time

    slam, _ = _run(async_mapping=True, n_frames=14)
    slam.local_mapper.start_async()
    try:
        kf_id = next(iter(slam.arena.kfs))
        with slam.arena.lock:
            # Worker picks the job up but blocks on arena.lock held here.
            slam.local_mapper.insert_keyframe(kf_id)
            time.sleep(0.1)
            t0 = time.monotonic()
            # Mirrors the internal path: reset while holding the lock.
            slam.tracker.reset()
            dt = time.monotonic() - t0
        assert dt < 20.0, f"reset stalled {dt:.1f}s (flush deadlock)"
        assert not slam.local_mapper.queue
        assert slam.arena.n_keyframes() == 0
    finally:
        slam.shutdown()


def test_bounded_queue_keyframe_admission():
    """While the async worker is busy, a demanded keyframe is still
    admitted into its queue as long as fewer than kf_async_queue are
    pending (upstream's stereo/RGB-D busy-path semantics,
    src/Tracking.cc:609-615, extended to monocular — without it a slow
    mapper suppresses the keyframe decision's own demand signal and the
    map settles into a thin equilibrium; docs/ROADMAP.md 'Async-mapping
    quality at map scale')."""
    W, H = 640, 480
    cam = CameraConfig(fx=520.0, fy=520.0, cx=W / 2, cy=H / 2, fps=30.0,
                       width=W, height=H)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=400),
                     sensor=Sensor.MONOCULAR)
    r = PlanarSceneRenderer(cam.K, W, H, texture=make_texture(2048, 8, 7),
                            tex_scale=220.0)
    poses = orbit_trajectory(12, radius=0.35, depth=-2.0, tilt=0.3)
    slam = System(None, cfg, Sensor.MONOCULAR, async_mapping=False)
    for i, Tcw in enumerate(poses):
        slam.track_monocular(r.render(Tcw), i / 30.0)
    tr = slam.tracker
    assert tr.state.name == "OK"

    class BusyMapper:
        """Stand-in exposing the surface need_new_keyframe touches."""
        _busy = False
        _expanding = False
        def __init__(self, inner):
            self.inner = inner
            self.queue = []
            self.interrupts = 0
        def accepting(self):
            return False                       # forever busy
        def interrupt_ba(self):
            self.interrupts += 1

    busy = BusyMapper(slam.local_mapper)
    tr.local_mapper = busy
    # Force the demand conditions: inliers under 90% of the reference
    # keyframe's tracked count.
    tr.n_inliers = 16
    tr.kf_async_queue = 3
    tr.kf_async_wait_s = 0.0        # drop-on-full (no backpressure wait)
    admitted = []
    for _ in range(5):
        if tr.need_new_keyframe():
            busy.queue.append(object())        # would-be insert
            admitted.append(True)
    assert len(busy.queue) == 3, busy.queue    # bounded at kf_async_queue
    assert busy.interrupts >= 5
    # Strict upstream monocular behavior when disabled: drop the want.
    tr.kf_async_queue = None
    assert tr.need_new_keyframe() is False

    # Backpressure (kf_async_wait_s > 0): with the queue full, the
    # decision DRAINS the backlog — releasing arena.lock so the worker
    # can run — and admits once the mapper caught up, instead of
    # dropping the demand (or topping up a perpetually-stale queue).
    # This is what keeps async mapping quality-neutral when the mapper
    # cannot keep pace with tracking (reference's three concurrent
    # threads are quality-neutral by design, src/System.cc:63-82).
    import threading
    import time

    tr.kf_async_queue = 3
    tr.kf_async_wait_s = 10.0
    busy.queue = [object()] * 3                # full

    # Default (round 5): the drain releases once every queued keyframe's
    # EXPANSION has landed (_expanding cleared) — the worker's
    # refinement phase (local BA / culling / loop detection, guaranteed
    # once per expansion batch by the worker restructure) then overlaps
    # the next tracking frames. kf_drain_release_on_expansion=False
    # restores the deterministic full drain (_busy). The release is
    # health-adaptive (kf_drain_full_ratio): keep this drain "healthy"
    # by pinning the EMA below the forced inlier count.
    tr._inl_ema = 10.0            # 16 inliers >= 0.8 x 10 -> healthy
    busy._busy = True
    busy._expanding = True

    def drain():
        time.sleep(0.25)
        # The waiter must have RELEASED arena.lock: verify we can take
        # it here (the worker's host phases need it to drain).
        assert tr.arena.lock.acquire(timeout=5.0), \
            "arena.lock held during backpressure wait"
        tr.arena.lock.release()
        busy.queue.clear()
        busy._expanding = False       # last triangulation landed:
        time.sleep(0.25)              # default drain releases HERE; the
        busy._busy = False            # full-drain mode waits for _busy

    th = threading.Thread(target=drain)
    th.start()
    t0 = time.monotonic()
    with tr.arena.lock:                        # tracking-section context
        got = tr.need_new_keyframe()
    dt = time.monotonic() - t0
    th.join()
    assert got is True                         # admitted after the drain
    # In [0.2, 0.45): released at expansion (first sleep), did NOT span
    # the second sleep waiting for _busy.
    assert 0.2 <= dt < 0.45, dt
    assert tr.kf_wait_stats["waits"] >= 1
    assert tr.kf_wait_stats["timeouts"] == 0

    # Health-adaptive fallback: a FRAGILE frame (inliers below
    # kf_drain_full_ratio x the OK-frame EMA) waits for the worker's
    # whole pipeline (_busy) even with expansion-release on — in
    # degraded segments the next frames must track a polished map, not
    # one-batch-stale raw triangulations.
    tr._inl_ema = 100.0           # 16 inliers < 0.8 x 100 -> fragile
    busy.queue = [object()] * 3
    busy._busy = True
    busy._expanding = True
    th = threading.Thread(target=drain)
    th.start()
    t0 = time.monotonic()
    with tr.arena.lock:
        got = tr.need_new_keyframe()
    dt = time.monotonic() - t0
    th.join()
    assert got is True
    assert 0.45 <= dt < 5.0, dt
    assert tr.kf_wait_stats.get("full_drains", 0) >= 1
    tr._inl_ema = 10.0

    # Full-drain opt-out: waits for the worker's whole pipeline (_busy),
    # spanning BOTH sleeps.
    tr.kf_drain_release_on_expansion = False
    busy.queue = [object()] * 3
    busy._busy = True
    busy._expanding = True
    th = threading.Thread(target=drain)
    th.start()
    t0 = time.monotonic()
    with tr.arena.lock:
        got = tr.need_new_keyframe()
    dt = time.monotonic() - t0
    th.join()
    assert got is True
    assert 0.45 <= dt < 5.0, dt
    tr.kf_drain_release_on_expansion = True

    # Timeout path: nothing drains -> demand dropped after the bound.
    tr.kf_async_wait_s = 0.3
    busy.queue = [object()] * 3
    t0 = time.monotonic()
    assert tr.need_new_keyframe() is False
    assert time.monotonic() - t0 < 2.0
    assert tr.kf_wait_stats["timeouts"] == 1
    tr.local_mapper = busy.inner
    slam.shutdown()
