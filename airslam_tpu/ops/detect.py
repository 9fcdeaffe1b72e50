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


def topk_keypoints(
    heat: jax.Array, threshold: float, border: int, k: int
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
    scores, idx = jax.lax.top_k(masked.reshape(-1), k)
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
