"""End-to-end frontend tests: detector (PLNet+SuperPoint) and matcher
(LightGlue/SuperGlue) with random weights — shape/mask/coordinate contracts
and matcher behavior on descriptor-identical inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airslam_tpu.frontend.detector import FeatureDetector, DetectorConfig, FrameFeatures
from airslam_tpu.frontend.matcher import PointMatcher, MatcherConfig


@pytest.fixture(scope="module")
def detector():
    cfg = DetectorConfig(max_keypoints=128, max_lines=64, max_junctions=64,
                         keypoint_threshold=1e-5, use_superpoint=True)
    return FeatureDetector(cfg, seed=0)


def test_detector_shapes_and_coords(detector):
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 480, 752).astype(np.float32)
    out = detector.detect(imgs, detect_junctions=True)
    assert out.keypoints.shape == (2, 128, 2)
    assert out.kp_desc.shape == (2, 128, 256)
    assert out.lines.shape == (2, 64, 4)
    assert out.junctions.shape == (2, 64, 2)
    kp = np.asarray(out.keypoints)
    mask = np.asarray(out.kp_mask)
    # with random weights + tiny threshold we should get plenty of keypoints
    assert mask.sum() > 10
    # coordinates rescaled to input resolution
    assert kp[mask][:, 0].max() < 752 and kp[mask][:, 1].max() < 480
    # descriptors L2-normalized
    d = np.asarray(out.kp_desc)[mask]
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_detector_deterministic(detector):
    rng = np.random.RandomState(1)
    img = rng.rand(1, 480, 752).astype(np.float32)
    a = detector.detect(img)
    b = detector.detect(img)
    assert np.array_equal(np.asarray(a.keypoints), np.asarray(b.keypoints))
    assert np.array_equal(np.asarray(a.kp_desc), np.asarray(b.kp_desc))


def _fake_features(n_valid, n_total, seed, kpts=None, desc=None):
    rng = np.random.RandomState(seed)
    if kpts is None:
        kpts = rng.rand(n_total, 2) * [752, 480]
    if desc is None:
        desc = rng.randn(n_total, 256)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    scores = rng.rand(n_total)
    mask = np.arange(n_total) < n_valid
    return kpts.astype(np.float32), scores.astype(np.float32), desc.astype(np.float32), mask


def test_lightglue_matches_identical_clouds():
    cfg = MatcherConfig(matcher=0, max_keypoints=64)
    pm = PointMatcher(cfg, seed=0)
    k, s, d, m = _fake_features(48, 64, seed=2)
    out = pm.match(k, s, d, m, k, s, d, m, threshold=1e-6)
    # identical inputs: every valid keypoint should match itself (the
    # assignment is symmetric and descriptors coincide). Random-init weights
    # aren't calibrated, so test the structure at a tiny threshold.
    idx = np.asarray(out.idx1)
    msk = np.asarray(out.mask)
    assert msk[:48].sum() > 40
    assert np.all(idx[msk] == np.nonzero(msk)[0])
    assert not msk[48:].any()


def test_lightglue_permutation_consistency():
    cfg = MatcherConfig(matcher=0, max_keypoints=32)
    pm = PointMatcher(cfg, seed=0)
    k, s, d, m = _fake_features(32, 32, seed=3)
    perm = np.random.RandomState(4).permutation(32)
    out = pm.match(k, s, d, m, k[perm], s[perm], d[perm], m, threshold=1e-6)
    idx = np.asarray(out.idx1)
    msk = np.asarray(out.mask)
    assert msk.sum() > 25
    # match i → position of i in perm
    inv = np.argsort(perm)
    assert np.all(idx[msk] == inv[np.nonzero(msk)[0]])


def test_superglue_contract():
    """SuperGlue emits raw (unnormalized) scores — with random weights the
    diagonal need not dominate, so test the decode contract: determinism,
    no padded matches, and symmetry of the mutual assignment."""
    cfg = MatcherConfig(matcher=1, max_keypoints=32)
    pm = PointMatcher(cfg, seed=0)
    k, s, d, m = _fake_features(24, 32, seed=5)
    out = pm.match(k, s, d, m, k, s, d, m, threshold=1e-9)
    idx = np.asarray(out.idx1)
    msk = np.asarray(out.mask)
    assert msk.sum() >= 1
    assert not msk[24:].any()  # padded queries never match
    assert np.all(idx[msk] < 24)  # never match padded keys
    out2 = pm.match(k, s, d, m, k, s, d, m, threshold=1e-9)
    assert np.array_equal(np.asarray(out2.idx1), idx)
    # raising the threshold can only shrink the match set
    out3 = pm.match(k, s, d, m, k, s, d, m, threshold=1e3)
    assert np.asarray(out3.mask).sum() <= msk.sum()


def test_matching_points_pairs_api():
    cfg = MatcherConfig(matcher=0, max_keypoints=32)
    pm = PointMatcher(cfg, seed=0)

    k, s, d, m = _fake_features(32, 32, seed=6)
    f0 = FrameFeatures(
        keypoints=k, kp_scores=s, kp_desc=d, kp_mask=m,
        lines=np.zeros((4, 4)), line_scores=np.zeros(4), line_mask=np.zeros(4, bool),
        junctions=np.zeros((4, 2)), junc_scores=np.zeros(4),
        junc_desc=np.zeros((4, 256)), junc_mask=np.zeros(4, bool),
    )
    pairs, scores = pm.matching_points(f0, f0, threshold=1e-6)
    assert pairs.shape[1] == 2
    assert len(pairs) > 25
    assert np.all(pairs[:, 0] == pairs[:, 1])


def test_matching_points_batched_matches_sequential():
    """matching_points_batched (one vmapped dispatch for B pairs — the
    relocalization top-3 loop) must return exactly what B sequential
    matching_points calls return."""
    cfg = MatcherConfig(matcher=0, max_keypoints=32)
    pm = PointMatcher(cfg, seed=0)

    def feats(seed):
        k, s, d, m = _fake_features(32, 32, seed=seed)
        return FrameFeatures(
            keypoints=k, kp_scores=s, kp_desc=d, kp_mask=m,
            lines=np.zeros((4, 4)), line_scores=np.zeros(4),
            line_mask=np.zeros(4, bool), junctions=np.zeros((4, 2)),
            junc_scores=np.zeros(4), junc_desc=np.zeros((4, 256)),
            junc_mask=np.zeros(4, bool),
        )

    fs = [feats(i) for i in range(4)]
    cands = [(fs[0], fs[1]), (fs[0], fs[2]), (fs[2], fs[3])]
    batched = pm.matching_points_batched(cands, threshold=0.01)
    assert len(batched) == 3
    for (a, b), (bp, bs) in zip(cands, batched):
        sp, ss = pm.matching_points(a, b, threshold=0.01)
        assert np.array_equal(bp, sp)
        # vmapped fp fusion differs slightly from the single-pair program
        np.testing.assert_allclose(bs, ss, rtol=1e-3, atol=1e-4)
