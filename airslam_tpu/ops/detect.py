"""Fixed-shape keypoint decoding (threshold + border + top-k).

Replaces ``PLNet::detect_point`` / ``keypoints_decoder`` (src/plnet.cpp:309-355,
duplicated src/super_point.cpp:174-217), which walk the heatmap on the host.

TPU-native formulation: the variable-length "collect all above threshold then
sort" becomes one masked ``lax.top_k`` over the flattened heatmap — static
output shape (K,), invalid slots carry score 0 and ``mask=False``. This keeps
the whole decode inside the fused per-frame XLA program (no host round trip,
no dynamic shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    xy: jax.Array  # (K, 2) float — x, y in heatmap pixels
    score: jax.Array  # (K,)
    mask: jax.Array  # (K,) bool


def top_k(scores: jax.Array, k: int, exact: bool = False):
    """Top-k over a flat score vector. On TPU the exact ``lax.top_k`` is a
    full sort (milliseconds at 512²); ``approx_max_k`` uses the native
    PartialReduce unit (recall ≥ 0.99 per bucket) — the few candidates it may
    swap are the lowest-scoring tail, which the SLAM layers treat identically.
    Set ``exact=True`` for bit-exact reference semantics."""
    if exact:
        return jax.lax.top_k(scores, k)
    if not jnp.issubdtype(scores.dtype, jnp.floating):
        # approx_max_k is float-only; int scores below 2^24 round-trip exactly
        vals, idx = jax.lax.approx_max_k(scores.astype(jnp.float32), k, recall_target=0.99)
        return vals.astype(scores.dtype), idx.astype(jnp.int32)
    vals, idx = jax.lax.approx_max_k(scores, k, recall_target=0.99)
    return vals, idx.astype(jnp.int32)


def topk_grid(masked: jax.Array, k: int, cell: int):
    """Two-stage top-k over a non-negative (H, W) plane: top-k CELLS by
    cell-max — every top-k pixel lives in one (each qualifying cell holds ≥1
    pixel ≥ the k-th score, and there are at most k such cells) — then top-k
    over the selected cells' k·cell² pixels. Two small sorts instead of a
    full-plane sort/PartialReduce (the flat 512² keypoint top-k and the 128²
    junction top-k were each ~0.15-0.3 ms/frame on TPU).

    Returns (scores (k,), flat_idx (k,) row-major into H·W)."""
    h, w = masked.shape
    hc, wc = h // cell, w // cell
    cells = masked.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(hc * wc, cell * cell)
    cmax = jnp.max(cells, axis=1)
    _, cidx = top_k(cmax, k)
    from airslam_tpu.ops import gather

    cand = gather.take_rows(cells, cidx)  # (k, cell²) — MXU, not serial slices
    scores, flat = top_k(cand.reshape(-1), k)
    ci = gather.take_values(cidx, flat // (cell * cell))
    within = flat % (cell * cell)
    x = (ci % wc) * cell + within % cell
    y = (ci // wc) * cell + within // cell
    return scores, y * w + x


def topk_keypoints(
    heat: jax.Array, threshold: float, border: int, k: int, exact: bool = False
) -> Keypoints:
    """Select top-k scoring pixels above ``threshold`` outside the border.

    Border semantics match the reference (src/plnet.cpp:320-331): a pixel is
    kept iff ``border <= x <= w - border`` and likewise for y (note the upper
    bound is inclusive of ``w - border``).
    """
    h, w = heat.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    keep = (
        (heat >= threshold)
        & (xs >= border)
        & (xs <= w - border)
        & (ys >= border)
        & (ys <= h - border)
    )
    masked = jnp.where(keep, heat, jnp.zeros_like(heat))

    if not exact and h % 8 == 0 and w % 8 == 0 and (h // 8) * (w // 8) >= 2 * k:
        scores, idx = topk_grid(masked, k, 8)
        x = (idx % w).astype(heat.dtype)
        y = (idx // w).astype(heat.dtype)
        valid = scores > 0
        return Keypoints(
            xy=jnp.stack([x, y], axis=-1),
            score=jnp.where(valid, scores, jnp.zeros_like(scores)),
            mask=valid,
        )

    scores, idx = top_k(masked.reshape(-1), k, exact)
    x = (idx % w).astype(heat.dtype)
    y = (idx // w).astype(heat.dtype)
    valid = scores > 0
    return Keypoints(
        xy=jnp.stack([x, y], axis=-1),
        score=jnp.where(valid, scores, jnp.zeros_like(scores)),
        mask=valid,
    )


def simple_nms(heat: jax.Array, radius: int) -> jax.Array:
    """Zero out non-maxima within a (2r+1)² window (used by the junction head;
    the keypoint decode itself is NMS-free to match the reference)."""
    if radius <= 0:
        return heat
    window = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        (window, window),
        (1, 1),
        "SAME",
    )
    return jnp.where(heat == pooled, heat, jnp.zeros_like(heat))
