"""Bit-exact import of the reference's shipped stage-1 checkpoint.

Oracle: ``models/onnx_exec.py`` executes ``plnet_s1.onnx`` directly (numpy).
The flax :class:`LoiHeadS1` with weights from ``import_plnet_s1`` must
reproduce ``scores_line``/``lines_adjusted`` on random inputs, including the
representative-proposal selection (first kept proposal per unique junction
pair — the reversed-ScatterElements trick in the graph).
"""

import os

import numpy as np
import pytest

S1 = "/root/reference/output/plnet_s1.onnx"
pytestmark = pytest.mark.skipif(not os.path.exists(S1), reason="reference onnx not mounted")


def _mk_inputs(rng, J=300, U=48, K=90, P=128 * 128 * 3):
    juncs = (rng.rand(J, 2) * 126).astype(np.float32)
    lines_pred = (rng.rand(P, 4) * 126).astype(np.float32)
    pairs = np.stack(
        [rng.randint(0, J, U), rng.randint(0, J, U)], axis=1
    ).astype(np.float32)
    iskeep = np.sort(rng.choice(P, K, replace=False)).astype(np.float32)[:, None]
    inverse = np.concatenate([np.arange(U), rng.randint(0, U, K - U)])
    rng.shuffle(inverse)
    # reference invariant: unique ids appear in first-occurrence order
    remap = {}
    for v in inverse:
        if v not in remap:
            remap[v] = len(remap)
    inverse = np.asarray([remap[v] for v in inverse], np.float32)[:, None]
    pairs = pairs[np.argsort([remap[u] for u in range(U)])]
    loi = rng.randn(1, 128, 128, 128).astype(np.float32)
    thin = rng.randn(1, 4, 128, 128).astype(np.float32)
    aux = rng.randn(1, 4, 128, 128).astype(np.float32)
    return dict(
        juncs_pred=juncs, lines_pred=lines_pred, idx_lines_for_junctions=pairs,
        inverse=inverse, iskeep_index=iskeep, loi_features=loi,
        loi_features_thin=thin, loi_features_aux=aux,
    )


def _rep_proposals(feeds):
    """First kept proposal per unique pair (the ONNX reversed-scatter)."""
    inverse = feeds["inverse"][:, 0].astype(int)
    iskeep = feeds["iskeep_index"][:, 0].astype(int)
    U = feeds["idx_lines_for_junctions"].shape[0]
    rep = np.zeros(U, int)
    seen = set()
    for i, u in enumerate(inverse):
        if u not in seen:
            seen.add(u)
            rep[u] = iskeep[i]
    return feeds["lines_pred"][rep]


def test_loi_head_s1_bit_exact():
    import jax.numpy as jnp

    from airslam_tpu.models.onnx_exec import run_graph
    from airslam_tpu.models.plnet import LoiHeadS1
    from airslam_tpu.models.weights import import_plnet_s1

    rng = np.random.RandomState(7)
    feeds = _mk_inputs(rng)
    ref = run_graph(S1, feeds)

    params = import_plnet_s1(S1)
    head = LoiHeadS1()

    juncs = feeds["juncs_pred"]
    pairs = feeds["idx_lines_for_junctions"].astype(int)
    lines = np.concatenate([juncs[pairs[:, 0]], juncs[pairs[:, 1]]], axis=1)
    prop = _rep_proposals(feeds)

    loi = feeds["loi_features"][0].transpose(1, 2, 0)  # CHW -> HWC
    thin = feeds["loi_features_thin"][0].transpose(1, 2, 0)
    aux = feeds["loi_features_aux"][0].transpose(1, 2, 0)
    score, adj = head.apply(
        params, jnp.asarray(lines), jnp.asarray(prop),
        jnp.asarray(loi), jnp.asarray(thin), jnp.asarray(aux),
    )
    np.testing.assert_allclose(np.asarray(adj), ref["lines_adjusted"], atol=0)
    np.testing.assert_allclose(
        np.asarray(score), ref["scores_line"], atol=2e-6, rtol=1e-5
    )


def test_wireframe_dedup_to_s1_end_to_end():
    """Full decode path: match_proposals → dedup_pairs (with representative
    proposals) → LoiHeadS1 reproduces the ONNX graph fed with the same
    iskeep/inverse tensors the reference host code would build
    (plnet.cpp:272-307)."""
    import jax.numpy as jnp

    from airslam_tpu.models.onnx_exec import run_graph
    from airslam_tpu.models.plnet import LoiHeadS1
    from airslam_tpu.models.weights import import_plnet_s1
    from airslam_tpu.ops import wireframe

    rng = np.random.RandomState(11)
    J, P, L = 300, 512, 64  # small P so most proposals collide into pairs
    jxy = (rng.rand(J, 2) * 126).astype(np.float32)
    juncs = wireframe.Junctions(
        xy=jnp.asarray(jxy), score=jnp.ones((J,)), mask=jnp.ones((J,), bool)
    )
    # proposals near junction pairs so they pass the 5-cell match gate
    a = rng.randint(0, 40, P)
    b = 40 + rng.randint(0, 40, P)
    props = np.concatenate(
        [jxy[a] + rng.randn(P, 2) * 0.5, jxy[b] + rng.randn(P, 2) * 0.5], axis=1
    ).astype(np.float32)
    logit = rng.randn(P).astype(np.float32)

    keep, jmin, jmax = wireframe.match_proposals(
        jnp.asarray(props), jnp.asarray(logit), juncs, 5.0
    )
    cands = wireframe.dedup_pairs(
        keep, jmin, jmax, juncs, J, L, line_pred=jnp.asarray(props)
    )
    nvalid = int(np.asarray(cands.mask).sum())
    assert nvalid > 10

    # reference host walk (plnet.cpp:283-305) on the same keep/jmin/jmax
    keep_np = np.asarray(keep)
    jmin_np = np.asarray(jmin)
    jmax_np = np.asarray(jmax)
    iskeep_idx = np.nonzero(keep_np)[0]
    uniq = {}
    inverse = []
    for i in iskeep_idx:
        key = (jmin_np[i], jmax_np[i])
        if key not in uniq:
            uniq[key] = len(uniq)
        inverse.append(uniq[key])
    U = len(uniq)
    assert U >= nvalid  # ours truncates at L
    pairs = np.zeros((U, 2), np.float32)
    for (mn, mx), u in uniq.items():
        pairs[u] = (mx, mn)  # reference stores (j, i) = (max, min)

    feeds = dict(
        juncs_pred=jxy,
        lines_pred=props,
        idx_lines_for_junctions=pairs,
        inverse=np.asarray(inverse, np.float32)[:, None],
        iskeep_index=iskeep_idx.astype(np.float32)[:, None],
        loi_features=rng.randn(1, 128, 128, 128).astype(np.float32),
        loi_features_thin=rng.randn(1, 4, 128, 128).astype(np.float32),
        loi_features_aux=rng.randn(1, 4, 128, 128).astype(np.float32),
    )
    ref = run_graph(S1, feeds)

    params = import_plnet_s1(S1)
    score, adj = LoiHeadS1().apply(
        params, cands.lines, cands.prop_lines,
        jnp.asarray(feeds["loi_features"][0].transpose(1, 2, 0)),
        jnp.asarray(feeds["loi_features_thin"][0].transpose(1, 2, 0)),
        jnp.asarray(feeds["loi_features_aux"][0].transpose(1, 2, 0)),
    )
    m = np.asarray(cands.mask)
    take = min(nvalid, U)
    np.testing.assert_allclose(
        np.asarray(adj)[m][:take], ref["lines_adjusted"][:take], atol=0
    )
    np.testing.assert_allclose(
        np.asarray(score)[m][:take], ref["scores_line"][:take], atol=2e-6, rtol=1e-5
    )


def test_loi_head_s1_border_cases():
    """Points at/beyond the feature-map border follow the graph's exact
    clamp arithmetic (zero weight at x = W-1, extrapolation below 0.5)."""
    import jax.numpy as jnp

    from airslam_tpu.models.onnx_exec import run_graph
    from airslam_tpu.models.plnet import LoiHeadS1
    from airslam_tpu.models.weights import import_plnet_s1

    rng = np.random.RandomState(3)
    feeds = _mk_inputs(rng, U=8, K=16)
    # force junctions onto the borders
    feeds["juncs_pred"][:8] = np.asarray(
        [[0, 0], [127.0, 127.0], [0.2, 126.9], [127.0, 0.0],
         [0.4, 0.4], [126.6, 126.6], [63.5, 0.1], [0.1, 63.5]], np.float32
    )
    feeds["idx_lines_for_junctions"] = np.asarray(
        [[0, 1], [2, 3], [4, 5], [6, 7], [0, 2], [1, 3], [4, 6], [5, 7]],
        np.float32,
    )
    ref = run_graph(S1, feeds)

    params = import_plnet_s1(S1)
    juncs = feeds["juncs_pred"]
    pairs = feeds["idx_lines_for_junctions"].astype(int)
    lines = np.concatenate([juncs[pairs[:, 0]], juncs[pairs[:, 1]]], axis=1)
    prop = _rep_proposals(feeds)
    score, _ = LoiHeadS1().apply(
        params, jnp.asarray(lines), jnp.asarray(prop),
        jnp.asarray(feeds["loi_features"][0].transpose(1, 2, 0)),
        jnp.asarray(feeds["loi_features_thin"][0].transpose(1, 2, 0)),
        jnp.asarray(feeds["loi_features_aux"][0].transpose(1, 2, 0)),
    )
    np.testing.assert_allclose(np.asarray(score), ref["scores_line"], atol=2e-6, rtol=1e-5)
