"""Host-side map arena: keyframes, map points, covisibility graph.

Replaces the reference's mutex-guarded pointer graph (Map src/Map.cc,
KeyFrame src/KeyFrame.cc, MapPoint src/MapPoint.cc, ~10 mutexes) with a
single-writer, integer-keyed store of numpy records. Sequential graph surgery
(covisibility updates, spanning tree, culling, erase protocols) is cheap and
inherently host-side; the arena's job is to (a) hold ground truth and (b)
marshal padded device arrays for the batched kernels.

Behavioral parity notes (reference file:line):
  * Covisibility edges require >= 15 shared points, always keeping the
    single best neighbor (KeyFrame::UpdateConnections src/KeyFrame.cc:269-359).
  * Spanning-tree parent = best covisible at first connection update (:351-357).
  * MapPoint representative descriptor = min-median-Hamming over observations
    (ComputeDistinctiveDescriptors src/MapPoint.cc:222-278).
  * Viewing normal + scale band 0.8/1.2 handled in update_normal_and_depth
    (UpdateNormalAndDepth src/MapPoint.cc:301-339; PredictScale :353-373).
  * Erase protocols: MapPoint::SetBadFlag removes observations everywhere;
    KeyFrame::SetBadFlag reparents children over the covisibility graph
    (src/KeyFrame.cc:433-525).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

COVIS_THRESHOLD = 15  # reference src/KeyFrame.cc:310


def hamming_np(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Packed uint32[...,8] Hamming distance on host."""
    return np.bitwise_count(np.bitwise_xor(d1, d2)).sum(axis=-1)


@dataclasses.dataclass
class FrameFeatures:
    """Host copy of a frame's padded feature arrays (level-0 coords)."""

    xy: np.ndarray        # f32[N,2] raw pixel coords
    xy_und: np.ndarray    # f32[N,2] undistorted pixel coords
    response: np.ndarray  # f32[N]
    angle: np.ndarray     # f32[N]
    octave: np.ndarray    # i32[N]
    desc: np.ndarray      # u32[N,8]
    valid: np.ndarray     # bool[N]
    # Stereo / RGB-D channel (reference mvuRight / mvDepth); None for mono.
    u_right: Optional[np.ndarray] = None   # f32[N], -1 = mono feature
    depth: Optional[np.ndarray] = None     # f32[N], -1 = no depth

    @property
    def n_slots(self) -> int:
        return self.xy.shape[0]

    def ur_or_neg(self) -> np.ndarray:
        return (self.u_right if self.u_right is not None
                else np.full(self.n_slots, -1.0, np.float32))


@dataclasses.dataclass
class MapPointRec:
    id: int
    pos: np.ndarray                      # f32[3] world
    desc: np.ndarray                     # u32[8] representative descriptor
    obs: Dict[int, int]                  # kf_id -> feature index
    normal: np.ndarray                   # f32[3]
    min_dist: float
    max_dist: float
    ref_kf: int
    first_kf_id: int
    n_visible: int = 1
    n_found: int = 1
    bad: bool = False
    replaced_by: int = -1

    def found_ratio(self) -> float:
        return self.n_found / max(self.n_visible, 1)


@dataclasses.dataclass
class KeyFrameRec:
    id: int
    frame_id: int
    timestamp: float
    Tcw: np.ndarray                      # f32[4,4]
    feats: FrameFeatures
    mp_ids: np.ndarray                   # i64[N], -1 = none
    covis: Dict[int, int] = dataclasses.field(default_factory=dict)
    parent: int = -1
    children: set = dataclasses.field(default_factory=set)
    loop_edges: set = dataclasses.field(default_factory=set)
    bad: bool = False
    not_erase: bool = False
    Tcp: Optional[np.ndarray] = None     # pose relative to parent at cull time
    node_ids: Optional[np.ndarray] = None  # i32[N] BoW direct-index nodes
    bow: Optional[dict] = None           # word id -> normalized TF-IDF weight

    def camera_center(self) -> np.ndarray:
        R = self.Tcw[:3, :3]
        t = self.Tcw[:3, 3]
        return -R.T @ t

    def n_tracked_points(self, arena: "MapArena", min_obs: int = 1) -> int:
        # Cached on the arena mutation counter: the keyframe-decision path
        # calls this EVERY frame for the reference keyframe (a ~1300-slot
        # Python loop of dict lookups), but the answer only changes when
        # the map does.
        key = (arena.version, min_obs)
        cached = getattr(self, "_ntp_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        rows, found = arena.lookup_points(self.mp_ids)
        n_obs = arena.point_columns()[5]
        n = int((found & (n_obs[rows] >= min_obs)).sum()) if len(n_obs) else 0
        self._ntp_cache = (key, n)
        return n


class MapArena:
    """Global map registry (reference Map src/Map.cc:13-112)."""

    def __init__(self):
        self.kfs: Dict[int, KeyFrameRec] = {}
        # Culled keyframes, kept for trajectory export: the spanning-tree
        # walk over Tcp needs them (reference System::SaveTrajectoryTUM
        # src/System.cc:341-345 walks mTcp past bad keyframes).
        self.dead_kfs: Dict[int, KeyFrameRec] = {}
        self.mps: Dict[int, MapPointRec] = {}
        # Replaced map points, kept as tombstones so trackers can follow
        # replaced_by chains to the surviving point (reference MapPoint::
        # GetReplaced, src/MapPoint.cc:153-190). obs are cleared, so each
        # tombstone is tiny.
        self.dead_mps: Dict[int, MapPointRec] = {}
        self.next_kf_id = 0
        self.next_mp_id = 0
        self.kf_origin_id = -1
        self.big_change_idx = 0
        # Monotone mutation counter: bumped whenever map-point state that
        # feeds the tracker's local-map block (pos/normal/dists/desc/alive
        # set) can change. Lets the tracker cache the padded local-map
        # arrays between keyframes (rebuilding them each frame was a major
        # host cost at device-speed frame rates).
        self.version = 0
        # Global-correction counter: bumped when keyframe POSES are
        # rewritten wholesale (loop correction / essential graph / global
        # BA apply). `version` tracks point-state mutations (it bumps
        # constantly during normal mapping); pose_epoch only moves when a
        # map-wide pose jump invalidates any free-running tracker pose —
        # the pipelined chain drops its device state and re-anchors, and
        # results enqueued before the bump are discarded (the upstream
        # analogue is UpdateLastFrame's per-frame re-anchor to the
        # reference keyframe, src/Tracking.cc:475-481).
        self.pose_epoch = 0
        # Map mutex (reference Map::mMutexMapUpdate, src/Map.cc): taken by
        # the tracker for the frame's arena-touching section and by the
        # async local-mapping worker around each stage's host phases. Both
        # sides RELEASE it around device fetches so tunnel round trips
        # overlap (the point of running mapping on its own thread).
        import threading
        self.lock = threading.RLock()
        # Correction-exclusion lock, ordered OUTSIDE self.lock (always
        # acquire correction_lock first, or release self.lock before
        # taking it). The tracker holds it for each FRAME's full span;
        # map-wide pose rewrites (loop correction, essential graph,
        # global-BA apply) hold it for the rewrite — reproducing
        # upstream's semantics where Track() and CorrectLoop both hold
        # mMutexMapUpdate end-to-end (src/Tracking.cc:179,
        # src/LoopClosing.cc:253). Our arena.lock alone cannot provide
        # that: both sides deliberately release it around device fetches
        # (unlocked()) so mapping overlaps tracking, which lets a
        # correction land MID-FRAME — the tracker then commits a
        # pre-correction pose and stores a relative pose against the
        # corrected reference, a silently poisoned Tcr_ref that the
        # UpdateLastFrame re-anchor faithfully reproduces (measured: the
        # async endurance gate lost tracking at a loop correction in 3
        # of 5 same-day runs). Ordinary mapping stages do NOT take this
        # lock, so the tracking/mapping RTT overlap is preserved;
        # corrections are rare and SHOULD stall tracking for their
        # duration, exactly like upstream.
        self.correction_lock = threading.RLock()
        # Callbacks fired when a keyframe is erased (e.g. keyframe-database
        # index maintenance, reference KeyFrameDatabase::erase).
        self.erase_hooks = []

    def unlocked(self):
        """Context manager releasing ONE level of self.lock (no-op when the
        caller doesn't hold it) — wraps device fetches inside otherwise
        locked sections so the other thread's host phases proceed during
        the tunnel round trip."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            try:
                self.lock.release()
                released = True
            except RuntimeError:
                released = False
            try:
                yield
            finally:
                if released:
                    self.lock.acquire()
        return _cm()

    def correction_unlocked(self):
        """Release ALL held levels of correction_lock (no-op when not
        held) — for tracker-side waits on the mapping worker
        (_wait_for_mapper_space, fragile-keyframe flush, reset flush):
        the worker must be able to run a loop correction while the
        tracker sleeps, or a correction demanded mid-drain stalls
        against the waiting frame. All levels, not one: the classic
        re-track of a discarded chain frame nests track() inside
        process_oldest's span (re-entrant RLock), and a single-level
        release would leave the lock held through the wait. ORDERING:
        nest this INSIDE unlocked() — `with unlocked(),
        correction_unlocked():` — so re-acquisition on exit takes
        correction_lock (outer) before arena.lock (inner)."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            n = 0
            try:
                while True:
                    self.correction_lock.release()
                    n += 1
            except RuntimeError:
                pass
            try:
                yield
            finally:
                for _ in range(n):
                    self.correction_lock.acquire()
        return _cm()

    # ----- creation -------------------------------------------------------

    def new_keyframe(self, frame_id, timestamp, Tcw, feats: FrameFeatures,
                     mp_ids=None) -> KeyFrameRec:
        kf = KeyFrameRec(
            id=self.next_kf_id,
            frame_id=frame_id,
            timestamp=timestamp,
            Tcw=np.asarray(Tcw, np.float32).copy(),
            feats=feats,
            mp_ids=(np.full(feats.n_slots, -1, np.int64)
                    if mp_ids is None else np.asarray(mp_ids, np.int64).copy()),
        )
        self.next_kf_id += 1
        self.kfs[kf.id] = kf
        if self.kf_origin_id < 0:
            self.kf_origin_id = kf.id
        return kf

    def new_point(self, pos, desc, ref_kf: int, first_kf_id: int) -> MapPointRec:
        self.version += 1
        mp = MapPointRec(
            id=self.next_mp_id,
            pos=np.asarray(pos, np.float32).copy(),
            desc=np.asarray(desc, np.uint32).copy(),
            obs={},
            normal=np.zeros(3, np.float32),
            min_dist=0.0,
            max_dist=0.0,
            ref_kf=ref_kf,
            first_kf_id=first_kf_id,
        )
        self.next_mp_id += 1
        self.mps[mp.id] = mp
        return mp

    # ----- observation bookkeeping ---------------------------------------

    def add_observation(self, mp: MapPointRec, kf: KeyFrameRec, feat_idx: int):
        # Bump the version: n_tracked_points and the tracker's local-map
        # block cache key on it, and every mutation of obs/mp_ids must
        # invalidate them (not just the batched refreshes that happen to
        # follow at current call sites).
        self.version += 1
        if kf.id not in mp.obs:
            mp.obs[kf.id] = int(feat_idx)
        kf.mp_ids[feat_idx] = mp.id

    def erase_observation(self, mp: MapPointRec, kf_id: int):
        self.version += 1
        idx = mp.obs.pop(kf_id, None)
        if idx is not None:
            kf = self.kfs.get(kf_id)
            if kf is not None and kf.mp_ids[idx] == mp.id:
                kf.mp_ids[idx] = -1
        if mp.ref_kf == kf_id and mp.obs:
            mp.ref_kf = next(iter(mp.obs))
        # Reference: erase the point once <= 2 observations remain
        # (MapPoint::EraseObservation src/MapPoint.cc).
        if len(mp.obs) <= 2 and not mp.bad:
            self.set_point_bad(mp)

    def set_point_pos(self, mp: MapPointRec, pos: np.ndarray):
        """Move a point, bumping the version so columnar caches
        (point_columns, local-map blocks) invalidate. ALL pos mutations
        must go through here — a silent in-place write would serve stale
        positions from the caches."""
        self.version += 1
        mp.pos = np.asarray(pos, np.float32).copy()

    # ----- columnar snapshots (version-keyed caches) ----------------------
    #
    # The reference's pointer-graph map is O(1) per record but O(n) Python
    # per bulk pass; these caches give the bulk passes (keyframe culling,
    # Sim3-guided search prep, frame-point gathers) vectorized numpy
    # columns instead, rebuilt only when the map version changes
    # (SURVEY.md §7.1 arena row: integer-indexed arrays replace pointers).

    def point_columns(self):
        """Sorted live map-point columns: (ids i64[P], pos f32[P,3],
        desc u32[P,8], min_dist f32[P], max_dist f32[P], n_obs i64[P],
        normal f32[P,3])."""
        cached = getattr(self, "_pc_cache", None)
        if cached is not None and cached[0] == self.version:
            return cached[1]
        P = len(self.mps)
        ids = np.fromiter(self.mps.keys(), np.int64, P)
        order = np.argsort(ids)
        ids = ids[order]
        recs = list(self.mps.values())
        pos = np.empty((P, 3), np.float32)
        desc = np.empty((P, 8), np.uint32)
        mind = np.empty(P, np.float32)
        maxd = np.empty(P, np.float32)
        nobs = np.empty(P, np.int64)
        normal = np.empty((P, 3), np.float32)
        for r, i in enumerate(order):
            mp = recs[i]
            pos[r] = mp.pos
            desc[r] = mp.desc
            mind[r] = mp.min_dist
            maxd[r] = mp.max_dist
            nobs[r] = len(mp.obs)
            normal[r] = mp.normal
        cols = (ids, pos, desc, mind, maxd, nobs, normal)
        self._pc_cache = (self.version, cols)
        return cols

    def lookup_points(self, mids: np.ndarray):
        """Vectorized id -> column-row resolution: returns (rows i64[N],
        found bool[N]) into point_columns(); rows of missing ids are 0."""
        ids = self.point_columns()[0]
        mids = np.asarray(mids, np.int64)
        pos = np.searchsorted(ids, mids)
        posc = np.minimum(pos, max(len(ids) - 1, 0))
        found = ((mids >= 0) & (pos < len(ids))
                 & (ids[posc] == mids)) if len(ids) else np.zeros(
                     mids.shape, bool)
        return posc, found

    def obs_table(self):
        """Columnar observation table (kf_id i64[M], feat_idx i64[M],
        mp_id i64[M], octave i64[M]) over all live keyframes' attached
        slots, filtered to live points. Built from the kf.mp_ids mirrors
        in one vectorized pass per keyframe."""
        cached = getattr(self, "_obs_cache", None)
        if cached is not None and cached[0] == self.version:
            return cached[1]
        kf_col, idx_col, mp_col, oct_col = [], [], [], []
        for kf in self.kfs.values():
            slots = np.nonzero(kf.mp_ids >= 0)[0]
            if not len(slots):
                continue
            kf_col.append(np.full(len(slots), kf.id, np.int64))
            idx_col.append(slots.astype(np.int64))
            mp_col.append(kf.mp_ids[slots].astype(np.int64))
            oct_col.append(kf.feats.octave[slots].astype(np.int64))
        if kf_col:
            tbl = [np.concatenate(kf_col), np.concatenate(idx_col),
                   np.concatenate(mp_col), np.concatenate(oct_col)]
            # Drop rows whose point died since the mirror was written.
            _, found = self.lookup_points(tbl[2])
            tbl = tuple(c[found] for c in tbl)
        else:
            z = np.zeros(0, np.int64)
            tbl = (z, z, z, z)
        self._obs_cache = (self.version, tbl)
        return tbl

    def set_point_bad(self, mp: MapPointRec):
        self.version += 1
        mp.bad = True
        for kf_id, idx in list(mp.obs.items()):
            kf = self.kfs.get(kf_id)
            if kf is not None and kf.mp_ids[idx] == mp.id:
                kf.mp_ids[idx] = -1
        mp.obs.clear()
        self.mps.pop(mp.id, None)

    def replace_point(self, old: MapPointRec, new: MapPointRec,
                      refresh_desc: bool = True):
        """MapPoint::Replace (src/MapPoint.cc:153-190): move observations,
        merge visibility counters. refresh_desc=False defers the
        distinctive-descriptor recompute so batch callers (fusion) can run
        ONE compute_distinctive_many over all survivors instead."""
        self.version += 1
        if old.id == new.id:
            return
        for kf_id, idx in list(old.obs.items()):
            kf = self.kfs.get(kf_id)
            if kf is None:
                continue
            # Mirror guard (same as erase_observation/set_point_bad): only
            # touch the slot if it still points at `old` — a diverged
            # slot belongs to some third point, and overwriting it would
            # silently detach that point's mirror.
            if kf.mp_ids[idx] != old.id:
                continue
            # new.obs is the authoritative observation set: O(1) membership
            # (scanning kf.mp_ids per observation made Replace O(N) and
            # dominated fusion-time host work).
            if kf_id not in new.obs:
                kf.mp_ids[idx] = new.id
                new.obs[kf_id] = idx
            else:
                kf.mp_ids[idx] = -1
        new.n_visible += old.n_visible
        new.n_found += old.n_found
        old.obs.clear()
        old.bad = True
        old.replaced_by = new.id
        self.mps.pop(old.id, None)
        self.dead_mps[old.id] = old
        if refresh_desc:
            self.compute_distinctive_descriptor(new)

    # ----- derived state --------------------------------------------------

    def compute_distinctive_descriptor(self, mp: MapPointRec):
        """Representative descriptor = min-median-Hamming over observations
        (reference src/MapPoint.cc:222-278)."""
        self.version += 1
        descs = []
        for kf_id, idx in mp.obs.items():
            kf = self.kfs.get(kf_id)
            if kf is not None and not kf.bad:
                descs.append(kf.feats.desc[idx])
        if not descs:
            return
        D = np.stack(descs)                       # [M,8]
        dist = hamming_np(D[:, None, :], D[None, :, :])  # [M,M]
        medians = np.median(dist, axis=1)
        mp.desc = D[int(np.argmin(medians))].copy()

    def update_normal_and_depth(self, mp: MapPointRec, scale_factors: np.ndarray):
        """Reference src/MapPoint.cc:301-351."""
        self.version += 1
        if not mp.obs:
            return
        normal = np.zeros(3, np.float64)
        for kf_id in mp.obs:
            kf = self.kfs.get(kf_id)
            if kf is None:
                continue
            v = mp.pos - kf.camera_center()
            n = np.linalg.norm(v)
            if n > 1e-9:
                normal += v / n
        mp.normal = (normal / max(len(mp.obs), 1)).astype(np.float32)
        ref = self.kfs.get(mp.ref_kf)
        if ref is None:
            return
        idx = mp.obs.get(mp.ref_kf)
        if idx is None:
            return
        dist = float(np.linalg.norm(mp.pos - ref.camera_center()))
        level = int(ref.feats.octave[idx])
        n_levels = len(scale_factors)
        mp.max_dist = dist * float(scale_factors[level])
        mp.min_dist = mp.max_dist / float(scale_factors[n_levels - 1])

    def update_normals_many(self, mps, scale_factors: np.ndarray):
        """update_normal_and_depth over many points, fully vectorized: one
        flat (point, observation) pair array, one normalization pass, one
        segment-sum (np.add.at) — the per-point Python loop paid numpy
        dispatch overhead for every tiny op and dominated keyframe-time
        host work (hundreds of points x a few observations each)."""
        self.version += 1
        mps = [mp for mp in mps if mp.obs]
        if not mps:
            return
        centers: Dict[int, Optional[np.ndarray]] = {}

        def center(kf_id):
            if kf_id not in centers:
                kf = self.kfs.get(kf_id)
                centers[kf_id] = (kf.camera_center()
                                  if kf is not None else None)
            return centers[kf_id]

        pt_of_pair: List[int] = []
        ctr_rows: List[np.ndarray] = []
        for p, mp in enumerate(mps):
            for kf_id in mp.obs:
                c = center(kf_id)
                if c is not None:
                    pt_of_pair.append(p)
                    ctr_rows.append(c)
        P = len(mps)
        pos = np.stack([mp.pos for mp in mps]).astype(np.float64)  # [P,3]
        normal = np.zeros((P, 3), np.float64)
        if ctr_rows:
            seg = np.asarray(pt_of_pair, np.int64)
            v = pos[seg] - np.stack(ctr_rows)                      # [E,3]
            nrm = np.linalg.norm(v, axis=1)
            v = np.where(nrm[:, None] > 1e-9,
                         v / np.maximum(nrm[:, None], 1e-12), 0.0)
            np.add.at(normal, seg, v)
        # Reference divides by the observation count (src/MapPoint.cc:
        # 301-351), including observations whose keyframe is gone.
        n_obs = np.asarray([max(len(mp.obs), 1) for mp in mps], np.float64)
        normal = (normal / n_obs[:, None]).astype(np.float32)
        n_levels = len(scale_factors)
        # Reference-keyframe distance band, vectorized over the points
        # whose ref_kf observation is alive.
        ref_rows, ref_ctrs, ref_lvls = [], [], []
        for p, mp in enumerate(mps):
            mp.normal = normal[p]
            idx = mp.obs.get(mp.ref_kf)
            if idx is None:
                continue
            c = center(mp.ref_kf)
            if c is None:
                continue
            ref_rows.append(p)
            ref_ctrs.append(c)
            ref_lvls.append(int(self.kfs[mp.ref_kf].feats.octave[idx]))
        if ref_rows:
            rr = np.asarray(ref_rows, np.int64)
            dist = np.linalg.norm(pos[rr] - np.stack(ref_ctrs), axis=1)
            maxd = dist * scale_factors[np.asarray(ref_lvls)]
            mind = maxd / float(scale_factors[n_levels - 1])
            for k, p in enumerate(ref_rows):
                mps[p].max_dist = float(maxd[k])
                mps[p].min_dist = float(mind[k])

    def compute_distinctive_many(self, mps):
        """compute_distinctive_descriptor over many points in one padded
        numpy pass (reference src/MapPoint.cc:222-278 semantics: pick the
        observation descriptor with the minimum median Hamming distance to
        the others). The per-point version pays a Python call + M^2 tiny
        hamming ops per point; here ALL points' pairwise distances form one
        [P, M*, M*] popcount tensor with column masking for ragged
        observation counts."""
        self.version += 1
        mps = [mp for mp in mps if not mp.bad]
        rows = []
        for mp in mps:
            descs = []
            for kf_id, idx in mp.obs.items():
                kf = self.kfs.get(kf_id)
                if kf is not None and not kf.bad:
                    descs.append(kf.feats.desc[idx])
            rows.append(descs)
        counts = np.asarray([len(r) for r in rows], np.int64)
        if not (counts > 0).any():
            return
        M = int(counts.max())
        P = len(mps)
        D = np.zeros((P, M, 8), np.uint32)
        for p, descs in enumerate(rows):
            if descs:
                D[p, :len(descs)] = np.stack(descs)
        dist = hamming_np(D[:, :, None, :], D[:, None, :, :]).astype(
            np.float64)                                        # [P,M,M]
        col = np.arange(M)
        col_ok = col[None, :] < counts[:, None]                # [P,M]
        # Median over the valid columns only, matching np.median on the
        # unpadded vector (average of the two middle order statistics).
        dist = np.where(col_ok[:, None, :], dist, np.inf)
        dist.sort(axis=2)
        safe = np.maximum(counts, 1)
        lo = (safe - 1) // 2
        hi = safe // 2
        pidx = np.arange(P)[:, None]
        med = 0.5 * (dist[pidx, col[None, :], lo[:, None]]
                     + dist[pidx, col[None, :], hi[:, None]])  # [P,M]
        med = np.where(col_ok, med, np.inf)
        best = np.argmin(med, axis=1)
        for p, mp in enumerate(mps):
            if counts[p] > 0:
                mp.desc = D[p, best[p]].copy()

    def update_connections(self, kf: KeyFrameRec):
        """Covisibility recount (reference src/KeyFrame.cc:269-359)."""
        counter: Dict[int, int] = {}
        for mid in kf.mp_ids:
            if mid < 0:
                continue
            mp = self.mps.get(int(mid))
            if mp is None or mp.bad:
                continue
            for other_id in mp.obs:
                if other_id != kf.id:
                    counter[other_id] = counter.get(other_id, 0) + 1
        if not counter:
            return
        best_id = max(counter, key=counter.get)
        edges = {k: w for k, w in counter.items() if w >= COVIS_THRESHOLD}
        if not edges:
            edges = {best_id: counter[best_id]}
        kf.covis = edges
        for other_id, w in edges.items():
            other = self.kfs.get(other_id)
            if other is not None:
                other.covis[kf.id] = w
        # Spanning tree: first connection update sets parent = best covis.
        if kf.parent < 0 and kf.id != self.kf_origin_id:
            kf.parent = best_id
            self.kfs[best_id].children.add(kf.id)

    def covisible_ordered(self, kf: KeyFrameRec, n: Optional[int] = None) -> List[int]:
        """Best covisible keyframes by weight (GetBestCovisibilityKeyFrames)."""
        items = sorted(kf.covis.items(), key=lambda kv: -kv[1])
        # .get: erased keyframes are removed from the registry (upstream
        # keeps them and callers check isBad — same contract here).
        ids = [k for k, _ in items
               if (okf := self.kfs.get(k)) is not None and not okf.bad]
        return ids if n is None else ids[:n]

    def erase_keyframe(self, kf: KeyFrameRec):
        """KeyFrame::SetBadFlag (src/KeyFrame.cc:433-525): detach
        observations, reparent children to the best covisible candidate
        within the already-connected set, record Tcp for trajectory export."""
        if kf.id == self.kf_origin_id or kf.not_erase:
            return
        # Observations and the keyframe set change below even when no
        # point goes bad: every version-keyed cache (point_columns n_obs,
        # obs_table, n_tracked_points, the tracker's local-map block)
        # must invalidate — cull_keyframes' redundancy recount relies on
        # it, and a missing bump let adjacent keyframes justify each
        # other's deletion from pre-cull observation rows.
        self.version += 1
        for idx, mid in enumerate(kf.mp_ids):
            if mid >= 0:
                mp = self.mps.get(int(mid))
                if mp is not None:
                    idx2 = mp.obs.pop(kf.id, None)
                    if idx2 is not None and len(mp.obs) <= 2:
                        self.set_point_bad(mp)
                    elif idx2 is not None:
                        if mp.ref_kf == kf.id and mp.obs:
                            mp.ref_kf = next(iter(mp.obs))
        # Remove EVERY reverse covisibility edge, not just kf.covis's:
        # update_connections REPLACES a keyframe's own covis dict (edges
        # below the threshold drop) while still writing itself into
        # neighbors' dicts, so A.covis can hold B without B.covis holding
        # A — erasing B through its own dict alone left dangling ids
        # (found by the 1250-frame endurance run at ~230 keyframes).
        for other in self.kfs.values():
            other.covis.pop(kf.id, None)
        # Reparent children: greedy over covisibility with candidate parents.
        candidates = {kf.parent} if kf.parent >= 0 else set()
        children = set(kf.children)
        while children:
            best = None  # (weight, child, parent)
            for c in children:
                ckf = self.kfs.get(c)
                if ckf is None:
                    children.discard(c)
                    break
                for cand in candidates:
                    w = ckf.covis.get(cand)
                    if w is not None and (best is None or w > best[0]):
                        best = (w, c, cand)
            if best is None:
                break
            _, c, p = best
            self.kfs[c].parent = p
            self.kfs[p].children.add(c)
            candidates.add(c)
            children.discard(c)
        # Orphans fall back to the erased KF's parent.
        for c in children:
            ckf = self.kfs.get(c)
            if ckf is not None and kf.parent >= 0:
                ckf.parent = kf.parent
                self.kfs[kf.parent].children.add(c)
        if kf.parent >= 0 and kf.parent in self.kfs:
            self.kfs[kf.parent].children.discard(kf.id)
            kf.Tcp = kf.Tcw @ np.linalg.inv(self.kfs[kf.parent].Tcw)
        kf.bad = True
        self.kfs.pop(kf.id, None)
        self.dead_kfs[kf.id] = kf
        for hook in self.erase_hooks:
            hook(kf.id)

    # ----- stats ----------------------------------------------------------

    def n_keyframes(self) -> int:
        return len(self.kfs)

    def n_points(self) -> int:
        return len(self.mps)
