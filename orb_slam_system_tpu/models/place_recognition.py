"""Place-recognition service: vocabulary + keyframe database lifecycle.

The reference requires the pre-trained 140MB ORBvoc.txt asset (SURVEY.md
§2.2, not shipped). This framework supports both:
  * an externally loaded vocabulary (reference text format, Vocabulary.load)
  * a lazily self-trained vocabulary: once the map has enough keyframes,
    train a k=10 tree from the map's own descriptors and backfill BoW for
    existing keyframes. Self-trained vocabularies are weaker than the
    offline-trained one but enable relocalization and loop closing with no
    external asset.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from orb_slam_system_tpu.mapping.arena import KeyFrameRec, MapArena
from orb_slam_system_tpu.mapping.keyframe_db import KeyFrameDatabase
from orb_slam_system_tpu.vocab.vocabulary import Vocabulary

MIN_KFS_FOR_SELF_TRAIN = 5
SELF_TRAIN_K = 10
SELF_TRAIN_L = 3


class PlaceRecognition:
    def __init__(self, vocab: Optional[Vocabulary] = None,
                 allow_self_train: bool = True):
        self.vocab = vocab
        self.db = KeyFrameDatabase(vocab) if vocab is not None else None
        self.allow_self_train = allow_self_train

    @property
    def ready(self) -> bool:
        return self.db is not None

    def maybe_self_train(self, arena: MapArena):
        if self.ready or not self.allow_self_train:
            return
        if arena.n_keyframes() < MIN_KFS_FOR_SELF_TRAIN:
            return
        descs = []
        docs = []
        for d, kf in enumerate(arena.kfs.values()):
            sel = kf.feats.desc[kf.feats.valid]
            descs.append(sel)
            docs.append(np.full(len(sel), d, np.int64))
        D = np.concatenate(descs, axis=0)
        if len(D) < 500:
            return
        # Each keyframe is one training document, giving DBoW2-style TF-IDF
        # weights (rare words discriminate; plane-texture words common to
        # every view score low).
        self.vocab = Vocabulary.build(D, k=SELF_TRAIN_K, L=SELF_TRAIN_L,
                                      seed=0, doc_ids=np.concatenate(docs))
        self.db = KeyFrameDatabase(self.vocab)
        # Backfill existing keyframes.
        for kf in arena.kfs.values():
            self._compute_bow(kf)
            self.db.add(kf.id, kf.bow)

    def _compute_bow(self, kf: KeyFrameRec):
        word_ids, weights, node_ids = self.vocab.transform(
            kf.feats.desc, kf.feats.valid)
        bow: dict[int, float] = {}
        for w, wt in zip(word_ids, weights):
            if w >= 0 and wt > 0:
                bow[int(w)] = bow.get(int(w), 0.0) + float(wt)
        norm = sum(abs(v) for v in bow.values())
        kf.bow = ({k: v / norm for k, v in bow.items()} if norm > 0 else {})
        kf.node_ids = node_ids

    def on_new_keyframe(self, kf: KeyFrameRec, arena: MapArena):
        """Compute BoW (reference KeyFrame::ComputeBoW src/KeyFrame.cc:39-48)
        and index it (KeyFrameDatabase::add)."""
        self.maybe_self_train(arena)
        if not self.ready:
            return
        if kf.bow is None:
            self._compute_bow(kf)
            self.db.add(kf.id, kf.bow)

    def on_erase_keyframe(self, kf_id: int):
        if self.ready:
            self.db.erase(kf_id)

    def frame_bow(self, desc: np.ndarray, valid: np.ndarray):
        """BoW + direct-index nodes for a (non-keyframe) frame (reference
        Frame::ComputeBoW src/Frame.cc:375-382)."""
        if not self.ready:
            return None, None
        word_ids, weights, node_ids = self.vocab.transform(desc, valid)
        bow: dict[int, float] = {}
        for w, wt in zip(word_ids, weights):
            if w >= 0 and wt > 0:
                bow[int(w)] = bow.get(int(w), 0.0) + float(wt)
        norm = sum(abs(v) for v in bow.values())
        if norm > 0:
            bow = {k: v / norm for k, v in bow.items()}
        return bow, node_ids

    def reset(self):
        if self.db is not None:
            self.db.clear()
