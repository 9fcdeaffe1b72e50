import numpy as np
import jax.numpy as jnp

from airslam_tpu.ops.detect import topk_keypoints, simple_nms
from airslam_tpu.ops.match import mutual_match, log_sinkhorn
from airslam_tpu.ops import wireframe


def np_detect_point(heat, threshold, border, top_k):
    """Oracle for the reference decode loop (plnet.cpp:309-355): threshold,
    inclusive border [border, w-border], sort by score desc, top-k."""
    h, w = heat.shape
    cands = []
    for i in range(h * w):
        s = heat.flat[i]
        if s < threshold:
            continue
        y, x = divmod(i, w)
        if x < border or x > w - border or y < border or y > h - border:
            continue
        cands.append((s, x, y))
    cands.sort(key=lambda t: -t[0])
    return cands[:top_k]


def test_topk_keypoints_matches_reference_semantics():
    rng = np.random.RandomState(0)
    heat = rng.rand(64, 80) ** 4  # sparse-ish
    ref = np_detect_point(heat, 0.5, 4, 50)
    out = topk_keypoints(jnp.asarray(heat), 0.5, 4, 50)
    got = [
        (float(out.score[i]), float(out.xy[i, 0]), float(out.xy[i, 1]))
        for i in range(50)
        if bool(out.mask[i])
    ]
    assert len(got) == len(ref)
    for (s0, x0, y0), (s1, x1, y1) in zip(sorted(got, key=lambda t: -t[0]), ref):
        assert abs(s0 - s1) < 1e-12 and x0 == x1 and y0 == y1


def test_topk_keypoints_padding():
    heat = np.zeros((32, 32))
    heat[10, 10] = 0.9
    out = topk_keypoints(jnp.asarray(heat), 0.1, 4, 8)
    assert int(out.mask.sum()) == 1
    assert tuple(np.asarray(out.xy[0])) == (10.0, 10.0)
    assert np.all(np.asarray(out.score[1:]) == 0)


def test_simple_nms():
    heat = np.zeros((16, 16))
    heat[5, 5] = 1.0
    heat[5, 6] = 0.8  # suppressed by neighbor
    heat[12, 12] = 0.7
    out = np.asarray(simple_nms(jnp.asarray(heat), 1))
    assert out[5, 5] == 1.0 and out[5, 6] == 0.0 and out[12, 12] == 0.7


def test_mutual_match():
    scores = np.log(np.array([
        [0.8, 0.05, 0.01],
        [0.02, 0.5, 0.3],
        [0.01, 0.6, 0.02],  # row 2 best col is 1, but col 1's best row is 2 → mutual
    ]))
    m0 = np.ones(3, bool)
    m1 = np.ones(3, bool)
    m = mutual_match(jnp.asarray(scores), jnp.asarray(m0), jnp.asarray(m1), 0.1)
    assert bool(m.mask[0]) and int(m.idx1[0]) == 0
    # row 1 best is col 1 (0.5) but col 1's max is row 2 (0.6) → not mutual
    assert not bool(m.mask[1])
    assert bool(m.mask[2]) and int(m.idx1[2]) == 1


def test_mutual_match_respects_masks():
    scores = np.log(np.full((4, 4), 0.9))
    m0 = np.array([True, True, False, False])
    m1 = np.array([True, False, True, True])
    m = mutual_match(jnp.asarray(scores), jnp.asarray(m0), jnp.asarray(m1), 0.1)
    assert not np.any(np.asarray(m.mask)[2:])
    matched_cols = set(int(c) for c in np.asarray(m.idx1)[np.asarray(m.mask)])
    assert 1 not in matched_cols


def test_sinkhorn_marginals():
    rng = np.random.RandomState(1)
    n0, n1 = 12, 10
    scores = rng.randn(n0, n1)
    mask0 = np.arange(n0) < 8
    mask1 = np.arange(n1) < 7
    z = log_sinkhorn(jnp.asarray(scores), jnp.asarray(mask0), jnp.asarray(mask1),
                     jnp.asarray(0.5), 100)
    p = np.exp(np.asarray(z))
    # each valid row should sum (incl. dustbin) to ~1
    rows = p.sum(axis=1)[:n0]
    assert np.allclose(rows[mask0], 1.0, atol=1e-3)
    cols = p.sum(axis=0)[:n1]
    assert np.allclose(cols[mask1], 1.0, atol=1e-3)
    # padded rows carry no mass in the inner block
    assert p[:n0, :n1][~mask0].max() < 1e-6


# -- wireframe decode -------------------------------------------------------


def _mk_junctions(coords):
    k = 300
    xy = np.zeros((k, 2), np.float32)
    score = np.zeros((k,), np.float32)
    xy[: len(coords)] = coords
    score[: len(coords)] = np.linspace(1.0, 0.5, len(coords))
    return wireframe.Junctions(
        xy=jnp.asarray(xy), score=jnp.asarray(score), mask=jnp.asarray(score > 0)
    )


def test_decode_junctions_topk_with_offsets():
    heat = np.zeros((128, 128), np.float32)
    heat[20, 30] = 0.9
    heat[64, 100] = 0.8
    off = np.full((128, 128, 2), 0.25, np.float32)
    j = wireframe.decode_junctions(jnp.asarray(heat), jnp.asarray(off), 300)
    assert int(j.mask.sum()) == 2
    assert np.allclose(np.asarray(j.xy[0]), [30.25, 20.25])
    assert np.allclose(np.asarray(j.xy[1]), [100.25, 64.25])


def test_match_and_dedup_pipeline():
    juncs = _mk_junctions([[10.0, 10.0], [50.0, 10.0], [10.0, 60.0]])
    # proposals: two near (j0, j1), one near (j0, j2), one unmatched
    props = np.array(
        [
            [10.5, 10.2, 49.5, 10.1],  # j0-j1
            [9.8, 9.9, 50.2, 10.3],  # j0-j1 duplicate
            [10.1, 10.0, 10.2, 59.5],  # j0-j2
            [90.0, 90.0, 120.0, 120.0],  # no junctions nearby
        ],
        np.float32,
    )
    logit = np.ones((4,), np.float32)
    keep, jmin, jmax = wireframe.match_proposals(
        jnp.asarray(props), jnp.asarray(logit), juncs, 5.0
    )
    assert np.asarray(keep).tolist() == [True, True, True, False]
    cands = wireframe.dedup_pairs(keep, jmin, jmax, juncs, 300, 16)
    assert int(cands.mask.sum()) == 2  # two unique pairs
    pairs = set(tuple(p) for p in np.asarray(cands.pairs)[np.asarray(cands.mask)].tolist())
    assert pairs == {(1, 0), (2, 0)}


def test_gate_lines_thresholds():
    lines = jnp.asarray(
        np.array(
            [
                [10, 10, 40, 10],  # long (120 px at ×4), high score
                [10, 10, 15, 10],  # short (20 px)
                [10, 10, 40, 40],  # long, low score
            ],
            np.float32,
        )
    )
    scores = jnp.asarray(np.array([0.9, 0.9, 0.6], np.float32))
    mask = jnp.ones((3,), jnp.bool_)
    out = wireframe.gate_lines(lines, scores, mask, (512, 512), 4, 0.75, 50.0)
    assert np.asarray(out.mask).tolist() == [True, False, False]
    # line 3 (score 0.6 ≥ 0.5) still marks junction pixels
    assert bool(out.junction_valid[2, 0])
    assert np.allclose(np.asarray(out.lines[0]), [40, 40, 160, 40])


def test_collect_junction_keypoints_dedup():
    lines = jnp.asarray(np.array([[10, 10, 40, 10], [10, 10, 40, 40]], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.9], np.float32))
    mask = jnp.ones((2,), jnp.bool_)
    decoded = wireframe.gate_lines(lines, scores, mask, (512, 512), 4, 0.75, 50.0)
    heat = np.random.RandomState(0).rand(512, 512).astype(np.float32)
    jk = wireframe.collect_junction_keypoints(decoded, jnp.asarray(heat), 32)
    # endpoints: (40,40), (160,40), (160,160) — shared (40,40) deduplicated
    assert int(jk.mask.sum()) == 3
    got = set(tuple(p) for p in np.asarray(jk.xy)[np.asarray(jk.mask)].astype(int).tolist())
    assert got == {(40, 40), (160, 40), (160, 160)}
