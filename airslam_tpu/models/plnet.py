"""PLNet: unified keypoint + line-segment CNN (AirSLAM's frontend detector).

Replaces the two TensorRT engines driven by ``src/plnet.cpp`` (stage-0
backbone ``plnet_s0.onnx``, plnet.cpp:24-196; stage-1 LOI verification head
``plnet_s1.onnx``, plnet.cpp:196-216) and their host glue.

Contract (matching plnet.cpp:453-462 output tensors):
- stage 0, from a (B, 512, 512, 1) grayscale image in [0, 1]:
  * ``scores``        (B, 512, 512)        SuperPoint-style keypoint heatmap
  * ``descriptors``   (B, 64, 64, 256)     stride-8 descriptor map
  * ``junc_heat``     (B, 128, 128)        junction heatmap at stride 4
  * ``junc_offset``   (B, 128, 128, 2)     sub-cell junction offsets
  * ``line_pred``     (B, 128, 128, 3, 4)  3 line proposals/cell, endpoints in
                                           128-grid coordinates (→ lines_pred)
  * ``line_logit``    (B, 128, 128, 3)     proposal confidence
  * ``loi``           (B, 128, 128, 128)   LOI pooling features
  * ``loi_thin``      (B, 128, 128, 4)
  * ``loi_aux``       (B, 128, 128, 4)
- stage 1 (:class:`LoiHead`): candidate junction-pair lines → verification
  score + endpoint adjustment (→ ``scores_line`` / ``lines_adjusted``).

TPU-native design notes: the reference computes junction-endpoint matching
(``iskeep``/``idx_junc_to_end_min/max``) inside the ONNX graph, dedups pairs on
the host (plnet.cpp:272-307), then runs a second dynamic-shape engine. Here
the *whole* pipeline — backbone, junction top-k, proposal↔junction matching,
pair dedup (scatter over a 300×300 key space), LOI sampling and verification —
is one fixed-shape XLA program (see ``airslam_tpu.ops.wireframe``), so there
is no host round trip between stages and no dynamic-shape recompile.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Fixed decode budget (static shapes for XLA).
NUM_JUNCTIONS = 300  # top-k junctions, = JN in plnet.cpp:284
NUM_PROPOSALS_PER_CELL = 3  # lines_pred leading dim 128*128*3 (plnet.cpp:469)
LOI_POINTS = 16  # samples along each candidate line
LOI_DIM = 128


class _ConvParams(nn.Module):
    """Parameter anchor with ``nn.Conv``'s exact param tree (kernel/bias) and
    init — declares a conv's weights WITHOUT executing it, so several logical
    convs sharing one input can be executed as a single fused convolution
    (same math per output channel; one HBM pass over the input instead of N).
    Checkpoint trees are unchanged: each logical conv keeps its own name."""

    features: int
    in_features: int
    ksize: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            self.ksize + (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


def _conv2d(x, kernel, bias, stride=(1, 1), padding="SAME"):
    """NHWC conv in the array dtype (bias added in the same dtype, matching
    nn.Conv's promotion rules)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(x.dtype)


class PLNetBackbone(nn.Module):
    """TPU-first shared encoder for the unified point+line detector.

    The reference's s0 engine wraps a SuperPoint-style VGG trunk (no trained
    s0 checkpoint ships, so the trunk is free to be redesigned; only the
    OUTPUT CONTRACT of plnet.cpp:453-462 is fixed). Design for the MXU/HBM:

    - space-to-depth stem (2×2 pixels → channels) so no 3×3 conv ever runs at
      512² — the classic SuperPoint conv1b alone is 19 GFLOP/view at 512²,
      ~60% of the whole backbone, and is memory-bound on its 33 MB
      activations; folding it to 256² is 4× cheaper in both FLOPs and HBM
      traffic with the same receptive field per output pixel.
    - channel widths rise 64→128 at stride 4 so the deepest convs (where 3×3
      work is 16× cheaper per channel than at stride 1) carry the capacity.

    Returns (feat (B, 64, 64, 128) at stride 8, {"c3": (B, 128, 128, 128)})
    — the same tensors the heads consume.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # space-to-depth as a 2×2 stride-2 IDENTITY convolution: channel
        # 2a+b of output cell (i, j) is pixel (2i+a, 2j+b) — exactly the
        # reshape/transpose s2d, but produced by the conv unit in its native
        # layout. The explicit reshape+transpose lowered to layout copies
        # worth ~0.27 ms/frame on TPU (the s2d reshape alone was the 3rd most
        # expensive op in the traced frontend); a 6×6 stride-2 fold of s2d
        # into conv1a was tried and is WORSE (~0.50 ms: Mosaic stages 1-input-
        # channel convs through an internal s2d with pathological copies).
        b, h, w, c = x.shape
        eye4 = np.zeros((2, 2, c, 4 * c), np.float32)
        for a in range(2):
            for bb in range(2):
                for ci in range(c):
                    eye4[a, bb, ci, (2 * a + bb) * c + ci] = 1.0
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype), jnp.asarray(eye4, self.dtype), (2, 2),
            "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv1a")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="conv1b")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # /4
        x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv2a")(x))
        x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv2b")(x))
        c3 = x  # stride 4, 128 ch
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # /8
        x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv3a")(x))
        x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv3b")(x))
        feat = x  # stride 8
        # deep levels for the line heads: endpoints of a 512-px segment sit
        # ±250 px from its center cell — far beyond the /8 receptive field;
        # two extra octaves at /16 and /32 are ~0.2 GFLOP/view and give the
        # proposal head the global context it needs
        y = nn.max_pool(feat, (2, 2), strides=(2, 2))  # /16
        y = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv4a")(y))
        y = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv4b")(y))
        c5 = y
        z = nn.max_pool(y, (2, 2), strides=(2, 2))  # /32
        z = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv5a")(z))
        z = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="conv5b")(z))
        return feat, {"c3": c3, "c5": c5, "c6": z}


class LineHeadTrunk(nn.Module):
    """Shared stride-4 line feature trunk: fuse c3 (/4) with the upsampled
    deeper pyramid levels (/8, /16, /32) so proposal regression sees whole
    segments, not just their center neighborhoods."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5=None, c6=None):
        b, h4, w4, _ = c3.shape
        parts = [c3, c4] + [t for t in (c5, c6) if t is not None]
        # 1×1 reduce before the 3×3: a 3×3 conv straight off the wide concat
        # would cost 4× more; reduce (1.2 GF) + 3×3 on 128 (4.8 GF) keeps the
        # trunk 128-wide. Execution: the fuse0 kernel is split per pyramid
        # level and applied AT SOURCE RESOLUTION, then upsampled and summed —
        # 1×1 conv and bilinear resize are both linear so they commute; this
        # never materializes the (B, 128², 512) concat (a pure layout copy
        # that traced at ~0.08 ms/frame) and runs the deep levels' matmuls at
        # 4×/16× fewer pixels.
        k0, b0 = _ConvParams(128, 128 * len(parts), ksize=(1, 1),
                             name="fuse0")()
        acc = None
        for i, t in enumerate(parts):
            y = _conv2d(t.astype(self.dtype),
                        k0[:, :, 128 * i:128 * (i + 1), :],
                        jnp.zeros((128,), jnp.float32))
            if y.shape[1] != h4:
                y = jax.image.resize(y, (b, h4, w4, 128), "bilinear")
            acc = y if acc is None else acc + y
        x = nn.relu(acc + b0.astype(acc.dtype))
        x = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype, name="fuse2")(x))
        return x


class PLNet(nn.Module):
    """Stage-0: shared backbone + keypoint heads + line heads."""

    dtype: Any = jnp.float32
    # endpoint offset scale from the (center) cell: LINEAR, not tanh-bounded —
    # segments can span ±125 cells of their center at 512², and a tanh cap
    # saturates gradients exactly on the long lines that need them
    offset_scale: float = 8.0

    @nn.compact
    def __call__(self, image):
        feat, skips = PLNetBackbone(dtype=self.dtype, name="backbone")(image)

        # -- SuperPoint heads (identical structure to models/superpoint.py).
        # convPa and convDa both 3×3-read the SAME stride-8 feature map: one
        # fused 512-wide conv halves the feat HBM traffic (relu and the
        # channel split commute).
        kpa, bpa = _ConvParams(256, 128, name="convPa")()
        kda, bda = _ConvParams(256, 128, name="convDa")()
        pd = nn.relu(_conv2d(feat.astype(self.dtype),
                             jnp.concatenate([kpa, kda], axis=-1),
                             jnp.concatenate([bpa, bda])))
        cpa, cda = pd[..., :256], pd[..., 256:]
        logits = nn.Conv(65, (1, 1), dtype=self.dtype, name="convPb")(cpa)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :64]
        b, hc, wc, _ = prob.shape
        scores = prob.reshape(b, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

        desc = nn.Conv(256, (1, 1), dtype=self.dtype, name="convDb")(cda).astype(jnp.float32)
        desc = desc / jnp.clip(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)

        # -- line trunk at stride 4 --------------------------------------
        trunk = LineHeadTrunk(dtype=self.dtype, name="line_trunk")(
            skips["c3"], feat, skips.get("c5"), skips.get("c6")
        )
        bt, h4, w4, _ = trunk.shape

        # -- trunk heads: SEVEN logical 3×3 convs over the same (B, 128²,
        # 128) trunk map, executed as ONE fused conv. Per-channel math is
        # identical to seven nn.Conv calls (weights concatenated on the
        # output axis), but the trunk is read from HBM once instead of seven
        # times — traced at ~1.0 ms/frame before (each small head ran at the
        # trunk's full memory cost), ~0.17 ms fused.
        p = NUM_PROPOSALS_PER_CELL
        head_specs = [("junc_heat", 1), ("junc_off", 2), ("line_pred", p * 4),
                      ("line_logit", p), ("loi", LOI_DIM), ("loi_thin", 4),
                      ("loi_aux", 4)]
        kbs = [_ConvParams(f, 128, name=n)() for n, f in head_specs]
        heads = _conv2d(trunk.astype(self.dtype),
                        jnp.concatenate([k for k, _ in kbs], axis=-1),
                        jnp.concatenate([bb for _, bb in kbs]))
        o, i0 = {}, 0
        for (n, f) in head_specs:
            o[n] = heads[..., i0:i0 + f]
            i0 += f

        junc_heat = jax.nn.sigmoid(o["junc_heat"].astype(jnp.float32))[..., 0]
        junc_offset = jax.nn.sigmoid(o["junc_off"].astype(jnp.float32))  # in [0,1] cell units

        line_raw = o["line_pred"].astype(jnp.float32) * self.offset_scale
        cy = jax.lax.broadcasted_iota(jnp.float32, (h4, w4), 0) + 0.5
        cx = jax.lax.broadcasted_iota(jnp.float32, (h4, w4), 1) + 0.5
        center = jnp.stack([cx, cy, cx, cy], axis=-1)  # (h4, w4, 4)
        line_pred = line_raw.reshape(bt, h4, w4, p, 4) + center[None, :, :, None, :]

        line_logit = o["line_logit"].astype(jnp.float32)

        loi = o["loi"]
        loi_thin = o["loi_thin"]
        loi_aux = o["loi_aux"]

        return {
            "scores": scores,
            "kp_logits": logits.astype(jnp.float32),  # (B, 64, 64, 65) for training CE
            "descriptors": desc,
            "junc_heat": junc_heat,
            "junc_offset": junc_offset,
            "line_pred": line_pred,
            "line_logit": line_logit,
            # kept in the compute dtype: the stage-1 head samples these with
            # MXU einsums — bf16 maps halve the HBM traffic on TPU
            "loi": loi,
            "loi_thin": loi_thin,
            "loi_aux": loi_aux,
        }


class LoiHead(nn.Module):
    """Stage-1: HAWP-style LOI pooling verification head.

    For each candidate line (a junction pair, in 128-grid coordinates) sample
    ``LOI_POINTS`` points along the segment from the ``loi``/``loi_thin``/
    ``loi_aux`` maps, max-pool 4:1 along the line, and regress a verification
    score (→ scores_line) plus a 4-d endpoint adjustment (→ lines_adjusted,
    consumed at ×4 upscale by the final decode, plnet.cpp:519-558).

    For the record, the reference's shipped ``plnet_s1.onnx`` (parsed with
    ``models/onnx_import.py``) implements this head as: 496-d pooled main
    features → Linear 496→128 → ReLU → 128→128 → ReLU → 128→128, plus a
    240-d thin/aux residual branch (240 = 30 samples × 8 thin+aux channels)
    → Linear 240→128, and a 2-way softmax score head. This module keeps an
    equivalent-capacity design with our sampling layout; swap the dims if
    importing upstream stage-1 weights.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lines, prop_lines, loi, loi_thin, loi_aux,
                 junc_xy=None, pair_idx=None):
        """lines: (L, 4) candidate (x1, y1, x2, y2) in 128-grid coords;
        feature maps: (128, 128, C). ``prop_lines`` is accepted for call
        compatibility with :class:`LoiHeadS1` and ignored (this fast head
        samples only the junction line). Returns (scores (L,), adjusted
        (L, 4))."""
        del prop_lines
        t = jnp.linspace(0.0, 1.0, LOI_POINTS, dtype=jnp.float32)
        p1 = lines[:, 0:2]
        p2 = lines[:, 2:4]
        pts = p1[:, None, :] + t[None, :, None] * (p2 - p1)[:, None, :]  # (L, T, 2)

        def samp(fmap):
            return _bilinear_lookup(fmap, pts)  # (L, T, C)

        f_main = samp(loi)
        f_thin = samp(loi_thin)
        f_aux = samp(loi_aux)
        feats = jnp.concatenate([f_main, f_thin, f_aux], axis=-1)  # (L, T, 136)
        l, tt, c = feats.shape
        pooled = feats.reshape(l, tt // 4, 4, c).max(axis=2)  # (L, T/4, C)
        flat = pooled.reshape(l, -1).astype(self.dtype)

        x = nn.relu(nn.Dense(1024, dtype=self.dtype, name="fc1")(flat))
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc2")(x))
        score = jax.nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="score")(x).astype(jnp.float32))[:, 0]
        delta = jnp.tanh(nn.Dense(4, dtype=self.dtype, name="delta")(x).astype(jnp.float32)) * 2.0
        return score, lines + delta


class LoiHeadS1(nn.Module):
    """Import-compatible stage-1 LOI verification head — the exact
    architecture of the reference's shipped ``plnet_s1.onnx`` (the ONE trained
    checkpoint in /root/reference/output), recovered by executing the graph
    with ``models/onnx_exec.py``:

    - per candidate line (junction pair, coords in the stride-4 128-grid):
      * f_ep = LOI features (128 ch) bilinearly sampled at each endpoint
        − 0.5 (2 × 128)
      * f_thin = thin features (4 ch) sampled at 30 interior points
        ``t·e1 + (1−t)·e2 − 0.5``, t = i/31 for i=1..30, along the JUNCTION
        line → flattened channel-major (120)
      * f_aux = aux features (4 ch) sampled along the REPRESENTATIVE LINE
        PROPOSAL (first kept proposal deduplicating to this pair) (120)
    - main: Linear(496→128)+ReLU → Linear(128→128)+ReLU → Linear(128→128)
    - residual: ReLU(Linear(240→128)) on [f_thin | f_aux]
    - score = softmax(Linear(128→2)(main + residual))[:, 1]
    - lines_adjusted = the junction coordinates themselves (plnet.cpp:544
      then ×4 upscale downstream).

    Weight mapping from the ONNX initializers is in
    ``models/weights.py::import_plnet_s1``; bit-exactness is tested against
    the numpy graph executor in tests/test_loi_s1.py.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, lines, prop_lines, loi, loi_thin, loi_aux,
                 junc_xy=None, pair_idx=None):
        """lines/prop_lines: (L, 4) (x1, y1, x2, y2) in 128-grid coords;
        loi: (128, 128, 128) HWC, loi_thin/aux: (128, 128, 4) HWC.
        Returns (scores (L,), lines_adjusted (L, 4)).

        ``junc_xy`` (J, 2) + ``pair_idx`` (L, 2): optional fast endpoint
        path — candidate endpoints ARE junction coordinates (dedup_pairs
        orders them (jmax, jmin)), so the 128-ch LOI map is sampled once per
        junction (J≤300) and gathered per line, instead of 2L=1024 samples
        whose (N, W, C) one-hot intermediates dominate the head's HBM
        traffic. Same coordinates and contraction — outputs agree to
        reduction-order rounding (≤1 ulp f32)."""
        n = 30
        # The ONNX graph bakes the two t-ramps as float32 constants whose
        # LSBs differ from 1-t of each other; keep them as parameters so the
        # importer can set the exact bits.
        t_fwd = self.param(
            "t_fwd", lambda k: (jnp.arange(1, n + 1, dtype=jnp.float32) / (n + 1))
        )
        t_rev = self.param(
            "t_rev", lambda k: (jnp.arange(n, 0, -1, dtype=jnp.float32) / (n + 1))
        )

        if junc_xy is not None and pair_idx is not None:
            f_junc = _onnx_bilerp(loi, junc_xy[:, 0] - 0.5, junc_xy[:, 1] - 0.5)
            j = junc_xy.shape[0]
            idx = jnp.clip(pair_idx, 0, j - 1)
            # row gathers lower to serial dynamic-slices on TPU; a one-hot
            # contraction fetches the same rows on the MXU, bit-exactly
            # (exactly one 1.0 per row: value·1 + Σ0 = value)
            l = idx.shape[0]
            ioj = jax.lax.broadcasted_iota(jnp.int32, (l, j), 1)
            exact = jax.lax.Precision.HIGHEST  # one-hot · f32 stays bit-exact
            f_ep1 = jnp.dot((ioj == idx[:, 0:1]).astype(f_junc.dtype), f_junc,
                            preferred_element_type=f_junc.dtype,
                            precision=exact)  # (L, 128)
            f_ep2 = jnp.dot((ioj == idx[:, 1:2]).astype(f_junc.dtype), f_junc,
                            preferred_element_type=f_junc.dtype,
                            precision=exact)
        else:
            e1 = lines[:, 0:2]
            e2 = lines[:, 2:4]
            f_ep1 = _onnx_bilerp(loi, e1[:, 0] - 0.5, e1[:, 1] - 0.5)  # (L, 128)
            f_ep2 = _onnx_bilerp(loi, e2[:, 0] - 0.5, e2[:, 1] - 0.5)

        def interior(seg):  # (L, 4) -> x (L, 30), y (L, 30)
            x = seg[:, 0:1] * t_fwd[None, :] + seg[:, 2:3] * t_rev[None, :] - 0.5
            y = seg[:, 1:2] * t_fwd[None, :] + seg[:, 3:4] * t_rev[None, :] - 0.5
            return x, y

        xj, yj = interior(lines)
        xp, yp = interior(prop_lines)
        # (L, 30, 4) -> channel-major flatten (L, 120) like the ONNX
        # Transpose([1,0,2]) of (4, L, 30)
        L = lines.shape[0]
        f_thin = _interior_feats(loi_thin, xj, yj, L)
        f_aux = _interior_feats(loi_aux, xp, yp, L)

        feats = jnp.concatenate([f_ep1, f_ep2, f_thin, f_aux], axis=-1).astype(self.dtype)
        res_in = jnp.concatenate([f_thin, f_aux], axis=-1).astype(self.dtype)

        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2_0")(feats))
        x = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2_2")(x))
        x = nn.Dense(128, dtype=self.dtype, name="fc2_4")(x)
        r = nn.relu(nn.Dense(128, dtype=self.dtype, name="fc2_res")(res_in))
        logits = nn.Dense(2, dtype=self.dtype, name="fc2_head")(x + r).astype(jnp.float32)
        score = jax.nn.softmax(logits, axis=-1)[:, 1]
        return score, lines


def _interior_feats(fmap: jax.Array, xx: jax.Array, yy: jax.Array,
                    n_lines: int) -> jax.Array:
    """Channel-major interior sampling (L, C·T) for the thin/aux branches.
    On the TPU bf16 path the lane-packed Pallas kernel already produces the
    channel-major layout (the coordinate arrays stay lane-dense — the
    row-major kernel's (N, 1) coords cost ~0.4 ms/frame at L=512)."""
    if fmap.dtype == jnp.bfloat16:
        from airslam_tpu.ops import bilerp_pallas

        if bilerp_pallas.available():
            out = bilerp_pallas.bilerp_points_t(fmap, xx, yy)  # (C, L, T)
            return out.transpose(1, 0, 2).reshape(n_lines, -1)
    return _onnx_bilerp(fmap, xx, yy).transpose(0, 2, 1).reshape(n_lines, -1)


def _onnx_bilerp(fmap: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sampling with the exact corner/clamp arithmetic of the
    reference's stage-1 graph: x0 = clip(floor(x), 0, W−1), x1 = clip(x0+1,
    0, W−1), weights (x1−x)/(x−x0) UNclamped (zero weight at exact borders,
    mild extrapolation below 0 — reproduced as-is for bit parity).

    TPU formulation: the separable form — one-hot row/column weight matrices
    contracted against the map on the MXU. Irregular 4-corner gathers lower
    to serial dynamic-slices on TPU (measured 1.4 ms/frame for the stage-1
    head); two dense matmuls do the same math in ~0.1 ms.

    fmap: (H, W, C); x, y: (...) float. Returns (..., C).
    """
    if fmap.dtype == jnp.bfloat16:
        from airslam_tpu.ops import bilerp_pallas

        if bilerp_pallas.available():
            # TPU frontend path: fused VMEM-resident Pallas kernel — same
            # corner arithmetic and bf16 weight rounding, f32 row
            # accumulation (the XLA path rounds its rows to bf16), and no
            # (N, W, C) HBM intermediate. CPU/f32 paths (incl. the bit-exact
            # stage-1 import test) keep the einsum formulation below.
            return bilerp_pallas.bilerp_points(fmap, x, y)
    h, w, _ = fmap.shape
    shape = x.shape
    x = x.reshape(-1)
    y = y.reshape(-1)
    x0f = jnp.clip(jnp.floor(x), 0.0, w - 1)
    y0f = jnp.clip(jnp.floor(y), 0.0, h - 1)
    x1f = jnp.clip(x0f + 1.0, 0.0, w - 1)
    y1f = jnp.clip(y0f + 1.0, 0.0, h - 1)
    x0 = x0f.astype(jnp.int32)
    x1 = x1f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    y1 = y1f.astype(jnp.int32)
    n = x.shape[0]
    # (N, W) / (N, H) one-hot weight rows built by iota comparison (pure VPU
    # elementwise — scatter construction measured 5× slower); when x0 == x1
    # (border clamp) the two terms ADD into the same slot, matching the
    # gather formulation where both corners read the same value
    colw = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    Wx = ((colw == x0[:, None]) * (x1f - x)[:, None]
          + (colw == x1[:, None]) * (x - x0f)[:, None]).astype(fmap.dtype)
    colh = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
    Wy = ((colh == y0[:, None]) * (y1f - y)[:, None]
          + (colh == y1[:, None]) * (y - y0f)[:, None]).astype(fmap.dtype)
    # f32 maps (tests/CPU) keep the exact f32 contract; bf16 maps (TPU
    # frontend) take the native bf16 MXU pass with f32 accumulation
    if fmap.dtype == jnp.float32:
        prec = jax.lax.Precision.HIGHEST
        rows = jnp.einsum("nh,hwc->nwc", Wy, fmap, precision=prec,
                          preferred_element_type=jnp.float32)  # (N, W, C)
        out = jnp.einsum("nwc,nw->nc", rows, Wx, precision=prec,
                         preferred_element_type=jnp.float32)  # (N, C)
    else:
        # keep the (N, W, C) intermediate in bf16 — it is the LOI head's
        # largest HBM tenant (L·30 samples × W=128 × C: ~31 MB/view at f32
        # for each of thin/aux); the row sum has ≤2 nonzero terms, so bf16
        # output rounding is a final-rounding error only. The second
        # contraction still accumulates in f32.
        rows = jnp.einsum("nh,hwc->nwc", Wy, fmap)  # (N, W, C) bf16
        out = jnp.einsum("nwc,nw->nc", rows, Wx,
                         preferred_element_type=jnp.float32)  # (N, C)
    return out.reshape(shape + (fmap.shape[-1],))


def _bilinear_lookup(fmap: jax.Array, pts: jax.Array) -> jax.Array:
    """Sample (H, W, C) at float (…, 2) (x, y) locations, border-clamped."""
    h, w, _ = fmap.shape
    x = jnp.clip(pts[..., 0], 0.0, w - 1.000001)
    y = jnp.clip(pts[..., 1], 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (x - x0.astype(x.dtype))[..., None]
    wy = (y - y0.astype(y.dtype))[..., None]
    flat = fmap.reshape(h * w, -1)
    v00 = flat[y0 * w + x0]
    v01 = flat[y0 * w + x1]
    v10 = flat[y1 * w + x0]
    v11 = flat[y1 * w + x1]
    return (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy
