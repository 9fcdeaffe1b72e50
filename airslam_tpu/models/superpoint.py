"""SuperPoint keypoint detector/descriptor as a JAX convnet.

Replaces the TensorRT engine driven by ``src/super_point.cpp`` (built from
``superpoint_v1_sim_int32.onnx``, cfg read_configs.h:41-42). Same contract:
grayscale (H, W) in [0, 1] resized to 512×512 → dense score heatmap (H, W)
and a stride-8 descriptor map (256, H/8, W/8); decoding (top-k + bilinear
descriptor sampling) lives in ``airslam_tpu.ops`` so it can fuse with the
matcher into one per-frame XLA program.

TPU notes: NHWC layout, bf16-friendly (params float32, compute dtype
configurable); the 65-channel cell softmax + depth-to-space decode is exactly
the published SuperPoint head, which XLA maps onto the MXU as 3×3 convs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class VGGBackbone(nn.Module):
    """SuperPoint's VGG-style encoder: 2×(64) /2 2×(64) /2 2×(128) /2 2×(128)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 1)
        skips = {}
        widths = [(64, 64), (64, 64), (128, 128), (128, 128)]
        for i, (wa, wb) in enumerate(widths):
            x = nn.Conv(wa, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i+1}a")(x)
            x = nn.relu(x)
            x = nn.Conv(wb, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{i+1}b")(x)
            x = nn.relu(x)
            skips[f"c{i+1}"] = x  # strides: c1 /1, c2 /2, c3 /4, c4 /8
            if i < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x, skips


class SuperPoint(nn.Module):
    """Detector + descriptor heads on the VGG backbone."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image):
        """image: (B, H, W, 1) in [0, 1]. Returns dict with
        ``scores`` (B, H, W) and ``descriptors`` (B, H/8, W/8, 256)."""
        feat, _ = VGGBackbone(dtype=self.dtype, name="backbone")(image)

        # Detector head: 65 = 8×8 cell pixels + dustbin.
        cpa = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="convPa")(feat))
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(cpa)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        b, hc, wc, _ = prob.shape
        # depth-to-space: (B, Hc, Wc, 8, 8) -> (B, Hc*8, Wc*8)
        scores = prob.reshape(b, hc, wc, 8, 8)
        scores = scores.transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        # Descriptor head (kept at stride 8; sampling interpolates later).
        cda = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="convDa")(feat))
        desc = nn.Conv(256, (1, 1), dtype=self.dtype, name="convDb")(cda)
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.clip(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

        return {
            "scores": scores,
            "kp_logits": logits.astype(jnp.float32),  # for the training CE
            "descriptors": desc,
        }
