"""Bag-of-words vocabulary — DBoW2-equivalent (reference Thirdparty/DBoW2).

A k^L tree of binary (256-bit) descriptor centroids with TF-IDF weights:
  * `load` reads the reference's ORBvoc.txt text format (per-line
    `parent is_leaf 32 descriptor bytes weight`, DBoW2
    TemplatedVocabulary.h:1342-1420) and caches a packed .npz binary.
  * `build` trains a small vocabulary from descriptors (hierarchical
    k-medoids on Hamming distance) for tests and vocabulary-free operation.
  * `transform` descends every descriptor through the tree by min-Hamming —
    batched level-by-level on device: each level is one Hamming
    distance-matrix (popcount-as-matmul on the MXU) against the candidate
    children block (SURVEY.md §7.1) — producing the BowVector (word ids +
    TF-IDF weights) and the direct-index node at `levels_up` from the leaves
    (reference Frame::ComputeBoW src/Frame.cc:375-382, levelsup=4).
  * `score` = L1 scoring (DBoW2 ScoringObject.cpp L1Scoring).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from orb_slam_system_tpu.mapping.arena import hamming_np


class Vocabulary:
    def __init__(self, k: int, L: int, node_desc: np.ndarray,
                 node_parent: np.ndarray, node_children: np.ndarray,
                 node_is_leaf: np.ndarray, node_weight: np.ndarray,
                 word_of_node: np.ndarray):
        self.k = k
        self.L = L
        self.node_desc = node_desc          # u32[n_nodes, 8]
        self.node_parent = node_parent      # i32[n_nodes]
        self.node_children = node_children  # i32[n_nodes, k] (-1 padded)
        self.node_is_leaf = node_is_leaf    # bool[n_nodes]
        self.node_weight = node_weight      # f32[n_nodes]
        self.word_of_node = word_of_node    # i32[n_nodes] (-1 if not a word)
        self.n_words = int((word_of_node >= 0).sum())

    # ------------------------------------------------------------------

    @classmethod
    def build(cls, descriptors: np.ndarray, k: int = 10, L: int = 3,
              seed: int = 0) -> "Vocabulary":
        """Hierarchical k-medoids on packed descriptors u32[N,8]."""
        rng = np.random.default_rng(seed)
        nodes_desc = [np.zeros(8, np.uint32)]   # root (unused descriptor)
        parents = [-1]
        children: list[list[int]] = [[]]
        levels = [0]

        def cluster(idx: np.ndarray, parent: int, level: int):
            if level >= L or len(idx) <= k:
                for i in idx[:k] if level >= L else idx:
                    pass
                return
            D = descriptors[idx]
            # k-medoids init: random distinct rows.
            sel = rng.choice(len(idx), size=min(k, len(idx)), replace=False)
            cents = D[sel]
            for _ in range(5):
                dist = hamming_np(D[:, None, :], cents[None, :, :])
                assign = np.argmin(dist, axis=1)
                new_cents = []
                for c in range(len(cents)):
                    members = D[assign == c]
                    if len(members) == 0:
                        new_cents.append(cents[c])
                        continue
                    # Bit-majority mean (FORB::meanValue semantics).
                    bits = np.unpackbits(
                        members.view(np.uint8), axis=1, bitorder="little")
                    mean_bits = (bits.mean(0) >= 0.5).astype(np.uint8)
                    new_cents.append(np.packbits(
                        mean_bits, bitorder="little").view(np.uint32))
                cents = np.stack([np.asarray(c).reshape(8) for c in new_cents])
            dist = hamming_np(D[:, None, :], cents[None, :, :])
            assign = np.argmin(dist, axis=1)
            for c in range(len(cents)):
                node_id = len(nodes_desc)
                nodes_desc.append(cents[c].astype(np.uint32))
                parents.append(parent)
                children.append([])
                levels.append(level + 1)
                children[parent].append(node_id)
                members = idx[assign == c]
                if level + 1 < L and len(members) > k:
                    cluster(members, node_id, level + 1)

        cluster(np.arange(len(descriptors)), 0, 0)
        n = len(nodes_desc)
        node_desc = np.stack(nodes_desc)
        node_parent = np.asarray(parents, np.int32)
        node_children = np.full((n, k), -1, np.int32)
        for i, ch in enumerate(children):
            node_children[i, :len(ch)] = ch
        node_is_leaf = np.asarray([len(ch) == 0 and i > 0
                                   for i, ch in enumerate(children)])
        word_of_node = np.full(n, -1, np.int32)
        w = 0
        for i in range(n):
            if node_is_leaf[i]:
                word_of_node[i] = w
                w += 1
        # Uniform IDF weights for built vocabularies (DBoW2 defaults to
        # TF_IDF computed from training data; uniform is the neutral choice).
        node_weight = np.where(node_is_leaf, 1.0, 0.0).astype(np.float32)
        return cls(k, L, node_desc, node_parent, node_children,
                   node_is_leaf, node_weight, word_of_node)

    # ------------------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        """Load ORBvoc.txt (reference text format) with .npz caching."""
        cache = path + ".npz"
        if os.path.exists(cache):
            z = np.load(cache)
            return cls(int(z["k"]), int(z["L"]), z["node_desc"],
                       z["node_parent"], z["node_children"], z["node_is_leaf"],
                       z["node_weight"], z["word_of_node"])
        with open(path, "r") as f:
            header = f.readline().split()
            k, L = int(header[0]), int(header[1])
            rows = []
            for line in f:
                parts = line.split()
                if len(parts) < 35:
                    continue
                parent = int(parts[0])
                is_leaf = bool(int(parts[1]))
                desc_bytes = np.asarray([int(x) for x in parts[2:34]], np.uint8)
                weight = float(parts[34])
                rows.append((parent, is_leaf, desc_bytes, weight))
        n = len(rows) + 1
        node_desc = np.zeros((n, 8), np.uint32)
        node_parent = np.full(n, -1, np.int32)
        node_is_leaf = np.zeros(n, bool)
        node_weight = np.zeros(n, np.float32)
        children: list[list[int]] = [[] for _ in range(n)]
        for i, (parent, is_leaf, db, w) in enumerate(rows):
            nid = i + 1
            node_parent[nid] = parent
            node_is_leaf[nid] = is_leaf
            node_desc[nid] = db.view(np.uint32)
            node_weight[nid] = w
            children[parent].append(nid)
        node_children = np.full((n, k), -1, np.int32)
        for i, ch in enumerate(children):
            node_children[i, :min(len(ch), k)] = ch[:k]
        word_of_node = np.full(n, -1, np.int32)
        w = 0
        for i in range(n):
            if node_is_leaf[i]:
                word_of_node[i] = w
                w += 1
        voc = cls(k, L, node_desc, node_parent, node_children,
                  node_is_leaf, node_weight, word_of_node)
        np.savez_compressed(
            cache, k=k, L=L, node_desc=node_desc, node_parent=node_parent,
            node_children=node_children, node_is_leaf=node_is_leaf,
            node_weight=node_weight, word_of_node=word_of_node)
        return voc

    # ------------------------------------------------------------------

    def transform(self, desc: np.ndarray, valid: Optional[np.ndarray] = None,
                  levels_up: int = 4):
        """Descend descriptors u32[N,8] through the tree.

        Returns (word_ids i32[N], word_weights f32[N], node_ids i32[N])
        where node_ids is the direct-index node at depth L-levels_up
        (reference transform(..., levelsup=4)). Invalid slots get -1.
        """
        N = desc.shape[0]
        if valid is None:
            valid = np.ones(N, bool)
        current = np.zeros(N, np.int32)           # start at root
        node_at_level = np.zeros(N, np.int32)     # root if target level is 0
        # Direct-index depth: L-levels_up, but at least level min(2, L-1) so
        # shallow (self-trained) vocabularies still discriminate (DBoW2's
        # levelsup=4 default assumes the L=6 ORBvoc).
        target_level = max(self.L - levels_up, min(2, self.L - 1))
        for level in range(self.L):
            ch = self.node_children[current]      # [N,k]
            has_child = ch >= 0
            # Hamming distance to each candidate child.
            cd = self.node_desc[np.maximum(ch, 0)]        # [N,k,8]
            dist = hamming_np(desc[:, None, :], cd)       # [N,k]
            dist = np.where(has_child, dist, 1 << 20)
            best = np.argmin(dist, axis=1)
            nxt = ch[np.arange(N), best]
            # Stop at leaves (keep current when no children).
            done = ~has_child.any(axis=1)
            current = np.where(done, current, nxt).astype(np.int32)
            if level + 1 == target_level:
                node_at_level = current.copy()
        word_ids = self.word_of_node[current]
        word_ids = np.where(valid, word_ids, -1).astype(np.int32)
        weights = np.where(word_ids >= 0, self.node_weight[current], 0.0)
        node_ids = np.where(valid, node_at_level, -1).astype(np.int32)
        return word_ids, weights.astype(np.float32), node_ids

    def bow_vector(self, desc: np.ndarray, valid: Optional[np.ndarray] = None):
        """Normalized sparse BowVector dict word_id -> weight (DBoW2
        BowVector with L1 normalization)."""
        word_ids, weights, _ = self.transform(desc, valid)
        bow: dict[int, float] = {}
        for w, wt in zip(word_ids, weights):
            if w >= 0 and wt > 0:
                bow[int(w)] = bow.get(int(w), 0.0) + float(wt)
        norm = sum(abs(v) for v in bow.values())
        if norm > 0:
            bow = {k: v / norm for k, v in bow.items()}
        return bow

    @staticmethod
    def score(bow1: dict, bow2: dict) -> float:
        """DBoW2 L1 scoring: 1 - 0.5 * |v1/|v1| - v2/|v2||_1, computed over
        the shared words (ScoringObject.cpp L1Scoring)."""
        s = 0.0
        for w, v1 in bow1.items():
            v2 = bow2.get(w)
            if v2 is not None:
                s += abs(v1) + abs(v2) - abs(v1 - v2)
        return 0.5 * s
