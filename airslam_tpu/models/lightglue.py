"""LightGlue feature matcher as a JAX attention stack.

Replaces the TensorRT engine of ``src/light_glue.cpp`` (built from
``superpoint_lightglue.onnx``; inputs keypoints (1, N, 2) normalized by
``PointMatcher::NormalizeKeypoints`` with scale 0.5 — point_matcher.cc:39-49 —
and descriptors (1, N, 256); output a dense (N0, N1) log-assignment ``scores``
matrix decoded by ``filter_matches`` with exp(score) > 0.1).

Architecture follows the LightGlue paper (arXiv 2306.13643): learnable-Fourier
rotary position encoding on self-attention, bidirectional cross-attention
sharing one similarity matrix, gated token updates, and a final assignment
combining per-point matchability logits with a doubly-log-softmaxed similarity.
Early-exit/pruning is intentionally omitted — on TPU a static 9-layer graph
at N≤1024 is faster than dynamic shapes (no recompiles, full MXU tiling).

Padded keypoints are handled with masks end-to-end so one compiled program
serves any keypoint count up to the static budget.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from airslam_tpu.ops.attention import flash_mha, mha


def rotate_half_pairs(x):
    """Rotate adjacent (even, odd) feature pairs: (a, b) -> (-b, a)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x, cos, sin):
    """x: (H, N, D); cos/sin: (N, D) with values repeated per pair."""
    return x * cos[None] + rotate_half_pairs(x) * sin[None]


class FourierRotary(nn.Module):
    """Learnable Fourier features for 2D rotary position encoding."""

    head_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kpts):  # (N, 2) normalized coords
        freqs = nn.Dense(self.head_dim // 2, use_bias=False, dtype=jnp.float32, name="freqs")(
            kpts
        )  # (N, D/2)
        emb = jnp.repeat(freqs, 2, axis=-1)  # (N, D) pairwise-repeated angles
        return jnp.cos(emb), jnp.sin(emb)


class TokenUpdate(nn.Module):
    """Gated residual update: x += MLP(LN([x | message]))."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, message):
        h = jnp.concatenate([x, message], axis=-1)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln")(h)
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h.astype(x.dtype)


class SelfBlock(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        h, d = self.heads, self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(-1, h, d).transpose(1, 0, 2)  # (H, N, D)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)
        attn = flash_mha if self.use_flash else mha
        out = attn(q, k, v, kv_mask=mask)
        out = out.transpose(1, 0, 2).reshape(-1, self.dim)
        msg = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return TokenUpdate(self.dim, dtype=self.dtype, name="update")(x, msg)


class CrossBlock(nn.Module):
    """Bidirectional cross-attention sharing one similarity matrix (in flash
    mode the two directions run as two fused kernels over the same Q/K
    projections — numerically identical, no (N0, N1) HBM round trip)."""

    dim: int
    heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x0, x1, mask0, mask1):
        h, d = self.heads, self.dim // self.heads
        to_qk = nn.Dense(self.dim, dtype=self.dtype, name="to_qk")
        to_v = nn.Dense(self.dim, dtype=self.dtype, name="to_v")
        proj = nn.Dense(self.dim, dtype=self.dtype, name="proj")

        def heads_first(t):
            return t.reshape(-1, h, d).transpose(1, 0, 2)

        qk0, qk1 = heads_first(to_qk(x0)), heads_first(to_qk(x1))
        v0, v1 = heads_first(to_v(x0)), heads_first(to_v(x1))

        if self.use_flash:
            m0 = flash_mha(qk0, qk1, v1, kv_mask=mask1)
            m1 = flash_mha(qk1, qk0, v0, kv_mask=mask0)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(d, x0.dtype))
            sim = jnp.einsum("hnd,hmd->hnm", qk0, qk1) * scale  # (H, N0, N1)
            neg = jnp.asarray(-1e9, sim.dtype)
            att01 = jax.nn.softmax(jnp.where(mask1[None, None, :], sim, neg), axis=-1)
            att10 = jax.nn.softmax(jnp.where(mask0[None, :, None], sim, neg), axis=-2)
            m0 = jnp.einsum("hnm,hmd->hnd", att01, v1)
            m1 = jnp.einsum("hnm,hnd->hmd", att10, v0)

        def merge(t):
            return t.transpose(1, 0, 2).reshape(-1, self.dim)

        upd = TokenUpdate(self.dim, dtype=self.dtype, name="update")
        x0 = upd(x0, proj(merge(m0)))
        x1 = upd(x1, proj(merge(m1)))
        return x0, x1


class LightGlue(nn.Module):
    dim: int = 256
    heads: int = 4
    layers: int = 9
    dtype: Any = jnp.float32
    # Pallas flash-attention for the self/cross blocks (TPU default via
    # MatcherConfig; falls back to plain XLA mha off-TPU automatically)
    use_flash: bool = False

    @nn.compact
    def __call__(self, kpts0, desc0, mask0, kpts1, desc1, mask1):
        """kpts: (N, 2) normalized (NormalizeKeypoints convention), desc:
        (N, 256) L2-normalized, mask: (N,) bool. Returns the (N0, N1)
        log-assignment matrix (the engine's ``scores`` output) and the two
        matchability logits."""
        head_dim = self.dim // self.heads
        rot = FourierRotary(head_dim, name="rotary")
        cos0, sin0 = rot(kpts0)
        cos1, sin1 = rot(kpts1)
        # keep q/k in the compute dtype through the rotary product — an f32
        # cos/sin would promote every attention matmul to the 4×-slower f32
        # MXU pass
        cos0, sin0, cos1, sin1 = (t.astype(self.dtype) for t in (cos0, sin0, cos1, sin1))

        input_proj = nn.Dense(self.dim, dtype=self.dtype, name="input_proj")
        x0 = input_proj(desc0)
        x1 = input_proj(desc1)

        for i in range(self.layers):
            sb = SelfBlock(self.dim, self.heads, dtype=self.dtype,
                           use_flash=self.use_flash, name=f"self{i}")
            x0 = sb(x0, cos0, sin0, mask0)
            x1 = sb(x1, cos1, sin1, mask1)
            x0, x1 = CrossBlock(self.dim, self.heads, dtype=self.dtype,
                                use_flash=self.use_flash, name=f"cross{i}")(
                x0, x1, mask0, mask1
            )

        final = nn.Dense(self.dim, dtype=self.dtype, name="final_proj")
        md0 = final(x0).astype(jnp.float32)
        md1 = final(x1).astype(jnp.float32)
        sim = md0 @ md1.T / jnp.sqrt(jnp.asarray(self.dim, jnp.float32))

        matchability = nn.Dense(1, dtype=jnp.float32, name="matchability")
        z0 = matchability(x0.astype(jnp.float32))[:, 0]
        z1 = matchability(x1.astype(jnp.float32))[:, 0]

        neg = jnp.asarray(-1e9, jnp.float32)
        sim_m = jnp.where(mask0[:, None] & mask1[None, :], sim, neg)
        scores = (
            jax.nn.log_softmax(sim_m, axis=1)
            + jax.nn.log_softmax(sim_m, axis=0)
            + jax.nn.log_sigmoid(z0)[:, None]
            + jax.nn.log_sigmoid(z1)[None, :]
        )
        return scores, z0, z1


def normalize_keypoints(kpts, width, height, scale=0.5):
    """PointMatcher::NormalizeKeypoints (point_matcher.cc:39-49):
    (x - w/2) * scale / max(w, h)."""
    l_inv = scale / max(width, height)
    center = jnp.asarray([width / 2.0, height / 2.0], kpts.dtype)
    return (kpts - center) * l_inv
