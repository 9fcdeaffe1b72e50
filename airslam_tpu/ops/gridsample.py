"""Bilinear sampling kernels: image remap (rectification) and descriptor
grid-sample.

Replaces the host-side ``cv::remap`` call (src/camera.cc:161-182) and the
keypoint descriptor interpolation ``PLNet::extract_descriptors``
(src/plnet.cpp:369-417, duplicated at src/super_point.cpp:224-272).

These are gather-based XLA formulations: TPU has no texture units, but a
(H*W, 2)-indexed gather over a VMEM-resident image fuses cleanly into the
surrounding graph, and descriptor sampling over N keypoints × 256 channels is
a batched gather + 4-tap weighted sum that XLA vectorizes well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def remap(image: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear remap: ``out[y, x] = image(grid[y, x, 0], grid[y, x, 1])``.

    ``image``: (H, W) or (H, W, C); ``grid``: (Ho, Wo, 2) with (x, y) source
    coordinates (cv::remap map1/map2 convention). Out-of-bounds taps clamp to
    the border (cv::BORDER_CONSTANT differs only on the frame edge, which the
    detector ignores via its border margin).
    """
    h, w = image.shape[0], image.shape[1]
    x = grid[..., 0]
    y = grid[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    def tap(yy, xx):
        return image[yy, xx]

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)

    if image.ndim == 3:
        wx = wx[..., None]
        wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def sample_descriptors(
    desc_map: jax.Array, kpts: jax.Array, stride: int = 8
) -> jax.Array:
    """Sample L2-normalized descriptors at keypoint locations.

    ``desc_map``: (C, Hc, Wc) descriptor grid at ``stride`` (C=256, stride 8);
    ``kpts``: (N, 2) (x, y) in *input-resolution* pixels.
    Returns (N, C), columns L2-normalized.

    Reproduces the exact align-corners arithmetic of ``extract_descriptors``
    (src/plnet.cpp:369-417): the normalization constants
    ``sx = 2/(w*s - s/2 - 0.5)``, ``bx = (1-s)/(w*s - s/2 - 0.5) - 1`` and the
    4-tap scheme whose NE/SW corners clamp *before* the +1 offset.
    """
    c, hc, wc = desc_map.shape
    s = float(stride)
    dx = wc * s - s / 2 - 0.5
    dy = hc * s - s / 2 - 0.5
    sx, bx = 2.0 / dx, (1.0 - s) / dx - 1.0
    sy, by = 2.0 / dy, (1.0 - s) / dy - 1.0

    xn = (kpts[:, 0] * sx + bx + 1.0) * 0.5
    yn = (kpts[:, 1] * sy + by + 1.0) * 0.5
    ix = xn * (wc - 1)
    iy = yn * (hc - 1)

    def clip(v, m):
        return jnp.clip(v, 0, m - 1)

    ix_nw = clip(jnp.floor(ix).astype(jnp.int32), wc)
    iy_nw = clip(jnp.floor(iy).astype(jnp.int32), hc)
    ix_ne = clip(ix_nw + 1, wc)
    iy_ne = iy_nw
    ix_sw = ix_nw
    iy_sw = clip(iy_nw + 1, hc)
    ix_se = clip(ix_nw + 1, wc)
    iy_se = clip(iy_nw + 1, hc)

    w_nw = (ix_se.astype(ix.dtype) - ix) * (iy_se.astype(iy.dtype) - iy)
    w_ne = (ix - ix_sw.astype(ix.dtype)) * (iy_sw.astype(iy.dtype) - iy)
    w_sw = (ix_ne.astype(ix.dtype) - ix) * (iy - iy_ne.astype(iy.dtype))
    w_se = (ix - ix_nw.astype(ix.dtype)) * (iy - iy_nw.astype(iy.dtype))

    # Gather (N, C) per corner: index the (C, Hc, Wc) map at flat positions.
    # Routed through the MXU one-hot path on TPU (serial dynamic-slice
    # avoidance, bit-exact); plain gather elsewhere.
    from airslam_tpu.ops import gather as _gather

    flat_t = desc_map.reshape(c, hc * wc).T  # (Hc·Wc, C)

    def gather(yy, xx):
        return _gather.take_rows(flat_t, yy * wc + xx)  # (N, C)

    out = (
        gather(iy_nw, ix_nw) * w_nw[:, None]
        + gather(iy_ne, ix_ne) * w_ne[:, None]
        + gather(iy_sw, ix_sw) * w_sw[:, None]
        + gather(iy_se, ix_se) * w_se[:, None]
    )
    # eps INSIDE the sqrt: points clamped to the far edge get exactly-zero
    # bilinear weights, and d‖x‖/dx at x=0 is NaN — which poisons training
    # gradients (clipping the norm afterwards does not help)
    norm = jnp.sqrt(jnp.sum(out * out, axis=1, keepdims=True) + 1e-24)
    return out / jnp.maximum(norm, 1e-12)
