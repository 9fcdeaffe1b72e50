"""SuperGlue feature matcher (alternative matcher, ``matcher: 1``).

Replaces the TensorRT engine of ``src/super_glue.cpp``: inputs are keypoints
(normalized with scale 0.7, point_matcher.cc:56), detection scores and 256-d
descriptors for both images; the output is the raw (N0, N1) score matrix that
the reference decodes with mutual argmax + exp > 0.2 (super_glue.cpp:339-367).
The reference ships a CPU log-Sinkhorn that is disabled; here optimal
transport is a flag (``sinkhorn_iterations > 0``) using
``airslam_tpu.ops.match.log_sinkhorn``.

Architecture per the SuperGlue paper (arXiv 1911.11763): keypoint MLP encoder
added to descriptors, alternating self/cross GNN attention layers with
residual message MLPs, final projection, scaled dot-product scores.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airslam_tpu.ops.attention import mha
from airslam_tpu.ops.match import log_sinkhorn

# The shipped superglue.npz checkpoint is trained THROUGH Sinkhorn with this
# iteration count (apps/train_matcher.py --arch superglue); inference must use
# the same so the exp > 0.2 decode sees genuine transport log-probs.
SG_SINKHORN_ITERS = 20


class KeypointEncoder(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kpts, scores):
        x = jnp.concatenate([kpts, scores[:, None]], axis=-1)  # (N, 3)
        for i, width in enumerate([32, 64, 128, 256]):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.LayerNorm(dtype=jnp.float32, name=f"ln{i}")(x).astype(self.dtype)
            x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(x)


class AttentionalPropagation(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, source, source_mask):
        h, d = self.heads, self.dim // self.heads

        def heads_first(t):
            return t.reshape(-1, h, d).transpose(1, 0, 2)

        q = heads_first(nn.Dense(self.dim, dtype=self.dtype, name="q")(x))
        k = heads_first(nn.Dense(self.dim, dtype=self.dtype, name="k")(source))
        v = heads_first(nn.Dense(self.dim, dtype=self.dtype, name="v")(source))
        msg = mha(q, k, v, kv_mask=source_mask)
        msg = msg.transpose(1, 0, 2).reshape(-1, self.dim)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="merge")(msg)

        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.dim, dtype=self.dtype, name="mlp1")(y)
        y = nn.LayerNorm(dtype=jnp.float32, name="mlp_ln")(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(y)
        return x + y


class SuperGlue(nn.Module):
    dim: int = 256
    heads: int = 4
    gnn_layers: int = 9
    sinkhorn_iterations: int = 0  # 0 = raw scores (reference behavior)
    # training-only: return the full (N0+1, N1+1) transport plan including the
    # dustbin row/col so unmatched keypoints can be supervised directly. Does
    # not change the parameter tree — inference uses return_full=False.
    return_full: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kpts0, scores0, desc0, mask0, kpts1, scores1, desc1, mask1):
        enc = KeypointEncoder(self.dim, dtype=self.dtype, name="kenc")
        x0 = desc0.astype(self.dtype) + enc(kpts0, scores0)
        x1 = desc1.astype(self.dtype) + enc(kpts1, scores1)

        for i in range(self.gnn_layers):
            sb = AttentionalPropagation(self.dim, self.heads, dtype=self.dtype, name=f"self{i}")
            x0 = sb(x0, x0, mask0)
            x1 = sb(x1, x1, mask1)
            cb = AttentionalPropagation(self.dim, self.heads, dtype=self.dtype, name=f"cross{i}")
            x0_new = cb(x0, x1, mask1)
            x1 = cb(x1, x0, mask0)
            x0 = x0_new

        final = nn.Dense(self.dim, dtype=self.dtype, name="final_proj")
        md0 = final(x0).astype(jnp.float32)
        md1 = final(x1).astype(jnp.float32)
        scores = md0 @ md1.T / jnp.asarray(self.dim, jnp.float32) ** 0.5

        if self.sinkhorn_iterations > 0:
            bin_score = self.param("bin_score", nn.initializers.ones, ())
            z = log_sinkhorn(scores, mask0, mask1, bin_score, self.sinkhorn_iterations)
            scores = z if self.return_full else z[:-1, :-1]
        return scores
