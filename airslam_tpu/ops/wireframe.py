"""Fixed-shape wireframe decode: junction selection, proposal↔junction
matching, pair dedup, and final line/junction gating.

Replaces the host-side ``PLNet::wireframe_matcher`` (src/plnet.cpp:272-307),
the stage-1 candidate feed (plnet.cpp:468-514) and the final decode
(plnet.cpp:519-585), reformulated with static shapes so everything fuses into
one XLA program:

- variable-length "collect kept proposals" → boolean masks over all P=3·128·128
  proposals;
- the 300×300 ``unique_map`` dedup → scatter-min of first-occurrence proposal
  order into a 90000-slot key array + top-k;
- the ``junction_map`` pixel grid → scatter-max of endpoint validity into the
  512² heatmap plane + top-k.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from airslam_tpu.ops import gather
from airslam_tpu.ops.detect import simple_nms, top_k, topk_grid


class Junctions(NamedTuple):
    xy: jax.Array  # (J, 2) in stride-4 grid coordinates
    score: jax.Array  # (J,)
    mask: jax.Array  # (J,)


class LineCandidates(NamedTuple):
    pairs: jax.Array  # (L, 2) int32 junction indices (max_idx, min_idx)
    lines: jax.Array  # (L, 4) endpoint coords in stride-4 grid
    mask: jax.Array  # (L,)
    prop_lines: jax.Array  # (L, 4) representative proposal endpoints


def decode_junctions(junc_heat: jax.Array, junc_offset: jax.Array, k: int,
                     exact: bool = False) -> Junctions:
    """Top-k junctions from the stride-4 heatmap with sub-cell offsets
    (produces the ``juncs_pred`` (300, 2) tensor of plnet.cpp:468)."""
    h, w = junc_heat.shape
    nmsed = simple_nms(junc_heat, 1)
    if not exact and h % 4 == 0 and w % 4 == 0 and (h // 4) * (w // 4) >= 2 * k:
        # two-stage cell top-k (see detect.topk_grid): the flat PartialReduce
        # over the 128² plane was ~0.15 ms/frame on TPU
        score, idx = topk_grid(nmsed, k, 4)
    else:
        score, idx = top_k(nmsed.reshape(-1), k, exact)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    off = gather.take_rows(junc_offset.reshape(h * w, 2), idx)
    xy = jnp.stack([xs, ys], axis=-1) + off
    return Junctions(xy=xy, score=score, mask=score > 0)


def match_proposals(
    line_pred: jax.Array,  # (P, 4) proposal endpoints, stride-4 coords
    line_logit: jax.Array,  # (P,)
    juncs: Junctions,
    match_threshold: float = 5.0,
    logit_threshold: float = None,
):
    """Attach each proposal endpoint to its nearest junction.

    Returns (keep (P,), jmin (P,), jmax (P,)) — the ``iskeep`` /
    ``idx_junc_to_end_min`` / ``idx_junc_to_end_max`` tensors of
    plnet.cpp:453-458, computed as two (P, J) distance argmins (a pair of
    MXU-friendly dense matmuls via the |a-b|² expansion).

    ``logit_threshold``: optional hard confidence gate. The default (None)
    keeps every junction-matched proposal: proposals reach here already
    ranked by logit (the top-k prefilter), dedup keeps the
    highest-ranked unique pairs, and the LOI verification head makes the
    final call — a hard zero-cut throws away true lines whose calibrated
    logits sit below 0.
    """
    jxy = jnp.where(juncs.mask[:, None], juncs.xy, jnp.full_like(juncs.xy, 1e6))

    # BOTH endpoints in one fused (2P, J) pass: the explicit-difference form
    # fuses into a single VPU sweep (compute ~12 MFLOP — nowhere near MXU
    # territory), where the |a|²−2ab+|b|² expansion materialized three
    # (P, J) planes per endpoint (~5× the HBM traffic of this stage).
    pts = jnp.concatenate([line_pred[:, 0:2], line_pred[:, 2:4]], axis=0)
    diff = pts[:, None, :] - jxy[None, :, :]
    dall = jnp.sum(diff * diff, axis=-1)  # (2P, J)
    jall = jnp.argmin(dall, axis=1).astype(jnp.int32)
    dmin = jnp.min(dall, axis=1)
    p = line_pred.shape[0]
    j1, j2 = jall[:p], jall[p:]
    d1, d2 = dmin[:p], dmin[p:]
    thr2 = match_threshold * match_threshold
    keep = (d1 < thr2) & (d2 < thr2) & (j1 != j2)
    if logit_threshold is not None:
        keep = keep & (line_logit > logit_threshold)
    jmin = jnp.minimum(j1, j2)
    jmax = jnp.maximum(j1, j2)
    return keep, jmin, jmax


def dedup_pairs(
    keep: jax.Array, jmin: jax.Array, jmax: jax.Array, juncs: Junctions,
    num_junctions: int, max_lines: int, line_pred: jax.Array = None,
) -> LineCandidates:
    """Unique (jmin, jmax) pairs in first-occurrence order, capped at
    ``max_lines`` — the TPU version of the ``unique_map`` walk
    (plnet.cpp:283-305). Candidate endpoints are the junction coordinates,
    ordered (jmax, jmin) like ``idx_lines_for_junctions_unique_``.

    ``line_pred`` (P, 4): when given, also returns each unique pair's
    REPRESENTATIVE proposal — the first kept proposal deduplicating to it —
    which the stage-1 head samples its aux features along (the reference
    feeds it via the reversed-ScatterElements trick inside plnet_s1.onnx).
    """
    p = keep.shape[0]
    n_keys = num_junctions * num_junctions
    # sort-based unique-with-first-occurrence: pack (key, order) into one
    # int32, sort (P log P over P≤4096 beats a scatter-min over the 90,000-
    # slot key space + a 90,000-wide top-k — those two ops were ~0.6 ms/frame
    # of the fused frontend), mark each key's first sorted entry, then rank
    # the survivors by original order. Exact, not approximate.
    key = jmin * num_junctions + jmax  # (P,)
    order = jnp.arange(p, dtype=jnp.int32)
    if n_keys * p < 2**31:
        packed = jnp.where(keep, key * p + order, jnp.int32(n_keys * p))
        packed = jnp.sort(packed)
        skey = packed // p
        sorder = packed % p
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
        ) & (skey < n_keys)
        rank = jnp.where(is_first, sorder, p)  # first occurrence, else pad
        if p < max_lines:  # tiny inputs (tests): pad so k ≤ n
            rank = jnp.concatenate([rank, jnp.full((max_lines - p,), p, rank.dtype)])
            skey = jnp.concatenate([skey, jnp.full((max_lines - p,), n_keys, skey.dtype)])
        neg_order, sel = top_k(-rank, max_lines)
        uniq_key = gather.take_values(skey, sel)
    else:
        # pack would overflow int32 (unprefiltered P): scatter-min fallback
        slot = jnp.full((n_keys,), p, dtype=jnp.int32)
        slot = slot.at[key].min(jnp.where(keep, order, p))
        neg_order, uniq_key = top_k(-slot, max_lines)
        uniq_key = uniq_key.astype(jnp.int32)
    first_occ = -neg_order
    valid = first_occ < p
    pair_min = (uniq_key // num_junctions).astype(jnp.int32)
    pair_max = (uniq_key % num_junctions).astype(jnp.int32)
    p1 = gather.take_rows(juncs.xy, pair_max)
    p2 = gather.take_rows(juncs.xy, pair_min)
    lines = jnp.concatenate([p1, p2], axis=-1)
    if line_pred is not None:
        rep = jnp.clip(first_occ, 0, p - 1).astype(jnp.int32)
        prop_lines = gather.take_rows(line_pred, rep)
    else:
        prop_lines = lines
    return LineCandidates(
        pairs=jnp.stack([pair_max, pair_min], axis=-1),
        lines=lines,
        mask=valid,
        prop_lines=prop_lines,
    )


class DecodedLines(NamedTuple):
    lines: jax.Array  # (L, 4) in 512-space pixels
    score: jax.Array  # (L,)
    mask: jax.Array  # (L,) — passed line_threshold + min length
    junction_xy: jax.Array  # (L, 4) int endpoints marked in the junction map
    junction_valid: jax.Array  # (L, 2) per-endpoint in-border validity


def gate_lines(
    lines_adjusted: jax.Array,  # (L, 4) stride-4 coords from the LOI head
    scores_line: jax.Array,  # (L,)
    cand_mask: jax.Array,  # (L,)
    image_hw: tuple,
    border: int,
    line_threshold: float,
    length_threshold: float,
) -> DecodedLines:
    """Final gating — plnet.cpp:519-558: ×4 upscale, junction-map marking at
    score ≥ 0.5, kept lines need score ≥ line_threshold and length ≥
    length_threshold px."""
    h, w = image_hw
    xy = lines_adjusted * 4.0
    xi = (xy + 0.1).astype(jnp.int32)
    p1_ok = (
        (xi[:, 0] > border) & (xi[:, 0] < w - border)
        & (xi[:, 1] > border) & (xi[:, 1] < h - border)
    )
    p2_ok = (
        (xi[:, 2] > border) & (xi[:, 2] < w - border)
        & (xi[:, 3] > border) & (xi[:, 3] < h - border)
    )
    junction_line = cand_mask & (scores_line >= 0.5)
    dx = xy[:, 2] - xy[:, 0]
    dy = xy[:, 3] - xy[:, 1]
    length2 = dx * dx + dy * dy
    keep = (
        junction_line
        & (scores_line >= line_threshold)
        & (length2 >= length_threshold * length_threshold)
    )
    return DecodedLines(
        lines=xy,
        score=jnp.where(cand_mask, scores_line, jnp.zeros_like(scores_line)),
        mask=keep,
        junction_xy=jnp.where(junction_line[:, None], xi, -jnp.ones_like(xi)),
        junction_valid=jnp.stack([p1_ok & junction_line, p2_ok & junction_line], axis=-1),
    )


def collect_junction_keypoints(
    decoded: DecodedLines,
    heat: jax.Array,  # (H, W) keypoint heatmap
    max_junctions: int,
):
    """Deduplicate accepted line endpoints into junction keypoints with the
    heatmap score attached (``junction_detector``, plnet.cpp:425-448).

    Candidate-space formulation: the ≤2L endpoint pixels are deduplicated by
    a sort over their flat indices and the heatmap is GATHERED at just those
    pixels — same content as the reference's row-major ``junction_map`` walk
    (output order differs; downstream use is order-free), at ~2L elements of
    work instead of a (H·W) scatter plane + 262k-wide top-k (~1 MB of HBM
    round trips per view saved in the fused frontend)."""
    h, w = heat.shape
    exy = decoded.junction_xy.reshape(-1, 2)  # (2L, 2) int
    evalid = decoded.junction_valid.reshape(-1)
    n = exy.shape[0]
    ys_i = jnp.clip(exy[:, 1], 0, h - 1)
    xs_i = jnp.clip(exy[:, 0], 0, w - 1)
    # heatmap gather at the ≤2L endpoint pixels as two dense one-hot
    # contractions (row select on the MXU, column select as a masked
    # reduce): a 1-D gather from the 512² plane lowers to SERIAL
    # dynamic-slices on TPU — measured 0.26 ms of the fused frontend's
    # junction stage, vs ~0.27 GFLOP ≈ µs for the matmul form
    ioh = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
    rows = jnp.dot((ioh == ys_i[:, None]).astype(heat.dtype), heat,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (n, w)
    iow = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    score_at = jnp.sum(rows * (iow == xs_i[:, None]),
                       axis=1).astype(heat.dtype)  # (n,)
    flat_idx = ys_i * w + xs_i
    key = jnp.where(evalid, flat_idx, h * w)  # invalid → sentinel
    skey, sscore = jax.lax.sort((key, score_at), num_keys=1)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    ) & (skey < h * w)
    safe = jnp.minimum(skey, h * w - 1)
    cand_score = jnp.where(is_first, sscore, jnp.full((n,), -1.0, heat.dtype))
    k = min(max_junctions, n)
    score, sel = top_k(cand_score, k)
    pos = gather.take_values(safe, sel)
    xs = (pos % w).astype(jnp.float32)
    ys = (pos // w).astype(jnp.float32)
    mask = score > -1.0
    score = jnp.where(mask, score, jnp.zeros_like(score))
    if k < max_junctions:  # tiny-config padding
        pad = max_junctions - k
        xs = jnp.concatenate([xs, jnp.zeros((pad,), xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros((pad,), ys.dtype)])
        score = jnp.concatenate([score, jnp.zeros((pad,), score.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return Junctions(xy=jnp.stack([xs, ys], axis=-1), score=score, mask=mask)
