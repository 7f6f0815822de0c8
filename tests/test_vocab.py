"""Vocabulary: ORBvoc.txt format loader, transform, scoring."""

import numpy as np

from orb_slam_system_tpu.vocab.vocabulary import Vocabulary


def _write_tiny_vocab(path, k=2, L=2, seed=0):
    """Synthesize a small vocabulary file in the reference text format:
    header `k L scoring weighting`, then per node: `parent is_leaf 32 bytes
    weight` (DBoW2 TemplatedVocabulary.h:1342-1420)."""
    rng = np.random.default_rng(seed)
    lines = [f"{k} {L} 0 0"]
    # Nodes in BFS order. Root is implicit (id 0); children ids follow file
    # order starting at 1. Hierarchically consistent: level-1 centroids are
    # far apart (all-0s vs all-1s), leaves are small perturbations of their
    # parent so greedy descent reaches the right leaf.
    n_level1 = k
    descs = []
    parents = [np.zeros(32, np.int64), np.full(32, 255, np.int64)][:k]
    for d in parents:
        descs.append(d)
        lines.append("0 0 " + " ".join(str(x) for x in d) + " 0")
    for parent in range(1, n_level1 + 1):
        base = parents[parent - 1]
        for c in range(k):
            d = base.copy()
            # Flip a distinct byte per child.
            d[c * 3] ^= 0xFF >> (c + 1)
            descs.append(d)
            lines.append(f"{parent} 1 " + " ".join(str(x) for x in d) + " 0.5")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return descs


def test_load_text_format(tmp_path):
    p = tmp_path / "voc.txt"
    _write_tiny_vocab(str(p))
    voc = Vocabulary.load(str(p))
    assert voc.k == 2 and voc.L == 2
    assert voc.n_words == 4  # k^L leaves
    # Cache created and loads identically.
    assert (tmp_path / "voc.txt.npz").exists()
    voc2 = Vocabulary.load(str(p))
    np.testing.assert_array_equal(voc.node_desc, voc2.node_desc)


def test_transform_assigns_words(tmp_path, rng):
    p = tmp_path / "voc.txt"
    descs = _write_tiny_vocab(str(p))
    voc = Vocabulary.load(str(p))
    # Descriptors equal to leaf centroids land exactly on those words.
    leaf_descs = np.stack([np.asarray(d, np.uint8).view(np.uint32)
                           for d in descs[2:]])  # leaves
    word_ids, weights, node_ids = voc.transform(leaf_descs.astype(np.uint32))
    assert (word_ids >= 0).all()
    assert len(set(word_ids.tolist())) == 4  # each leaf hits its own word
    assert (weights > 0).all()


def test_bow_score_properties(rng):
    D = rng.integers(0, 2 ** 32, size=(400, 8), dtype=np.uint32)
    voc = Vocabulary.build(D, k=5, L=2, seed=0)
    b1 = voc.bow_vector(D[:100])
    b2 = voc.bow_vector(D[100:200])
    s_self = Vocabulary.score(b1, b1)
    s_cross = Vocabulary.score(b1, b2)
    assert 0.99 < s_self <= 1.001
    assert 0.0 <= s_cross <= s_self + 1e-6
