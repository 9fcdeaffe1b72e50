"""Fused feature detector: resize → PLNet → wireframe decode → keypoint
decode → descriptor sampling, as ONE jitted XLA program.

Replaces ``FeatureDetector`` (src/feature_detector.cc) + ``PLNet::infer``
(src/plnet.cpp:221-585) + ``SuperPoint::infer`` (src/super_point.cpp:103-144).
The reference runs ≥2 TensorRT executions per image with host↔device copies
and host decode between stages; here the whole per-image pipeline is a single
fixed-shape program, so a stereo pair is detected as a batch of 2 with zero
host round trips (BASELINE.json north star).

Config semantics mirror ``PLNetConfig`` (read_configs.h): ``max_keypoints``
(400), ``keypoint_threshold`` (0.004), ``remove_borders`` (4),
``line_threshold`` (0.75), ``line_length_threshold`` (50),
``use_superpoint`` (points from a separate SuperPoint net; PLNet supplies
lines/junctions only — feature_detector.cc:7-34).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airslam_tpu.models.plnet import PLNet, LoiHead, LoiHeadS1, NUM_JUNCTIONS
from airslam_tpu.models.superpoint import SuperPoint
from airslam_tpu.ops import wireframe
from airslam_tpu.ops.detect import topk_keypoints
from airslam_tpu.ops.gridsample import sample_descriptors

DETECT_SIZE = 512  # network input resolution (plnet.cpp:17-22)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    max_keypoints: int = 400
    keypoint_threshold: float = 0.004
    remove_borders: int = 4
    line_threshold: float = 0.75
    line_length_threshold: float = 50.0
    use_superpoint: bool = True
    max_lines: int = 512
    max_junctions: int = 256
    junction_match_threshold: float = 5.0  # stride-4 cells
    # proposal prefilter: keep the top-k proposals by confidence before
    # junction matching. The reference scans all 3·128·128 = 49152 proposals
    # (plnet.cpp:277-281); matching+dedup over them dominates decode time on
    # TPU (~5 ms/pair), while ≤ max_lines (512) survive dedup anyway — 4096
    # candidates is an 8× safety margin at 12× less work.
    max_proposals: int = 4096
    # window-max prestage width for the prefilter (best proposal per `window`
    # consecutive proposals = per 2 cells, then top-max_proposals over the
    # window maxima). 1 disables it (flat top-k over all proposals).
    proposal_window: int = 6
    # "s1": the import-compatible stage-1 head (plnet_s1.onnx architecture,
    # loads the reference's trained checkpoint); "fast": the narrower
    # 16-sample head. Both fuse into the same per-frame program.
    loi_head: str = "s1"
    dtype: Any = jnp.float32


class FrameFeatures(NamedTuple):
    """Fixed-shape per-image detection output (coords in input resolution)."""

    keypoints: jax.Array  # (K, 2)
    kp_scores: jax.Array  # (K,)
    kp_desc: jax.Array  # (K, 256)
    kp_mask: jax.Array  # (K,)
    lines: jax.Array  # (L, 4)
    line_scores: jax.Array  # (L,)
    line_mask: jax.Array  # (L,)
    junctions: jax.Array  # (J, 2)
    junc_scores: jax.Array  # (J,)
    junc_desc: jax.Array  # (J, 256)
    junc_mask: jax.Array  # (J,)


def _detect_single(
    plnet_out: dict,
    sp_out: Optional[dict],
    cfg: DetectorConfig,
    w_scale: float,
    h_scale: float,
    detect_junctions: bool,
    loi_apply,
    loi_params,
) -> FrameFeatures:
    """Decode one image's network outputs (all fixed shapes)."""
    # Which heatmap/descriptors feed the keypoints (feature_detector.cc:7-34).
    point_src = sp_out if (cfg.use_superpoint and sp_out is not None) else plnet_out
    heat = point_src["scores"]
    desc_map = point_src["descriptors"]  # (64, 64, 256) NHWC

    # -- lines -------------------------------------------------------------
    juncs = wireframe.decode_junctions(
        plnet_out["junc_heat"], plnet_out["junc_offset"], NUM_JUNCTIONS
    )
    p = plnet_out["line_pred"].reshape(-1, 4)
    logit = plnet_out["line_logit"].reshape(-1)
    if 0 < cfg.max_proposals < p.shape[0]:
        from airslam_tpu.ops import gather
        from airslam_tpu.ops.detect import top_k

        n = p.shape[0]
        win = cfg.proposal_window
        if win > 1 and n % win == 0 and n // win >= cfg.max_proposals:
            # window-max prestage: keep each win-proposal window's best, then
            # exact top-k over the n/win window maxima. A flat top-4096 of
            # 49152 falls back to a full sort on TPU (~0.26 ms/frame traced;
            # approx_max_k degenerates at that k/n ratio); the windowed form
            # sorts 8192. In-window runner-ups are proposals of the SAME 2
            # cells that dedup_pairs would collapse anyway (the prefilter is
            # already an 8× margin over the 512 kept lines).
            lg = logit.reshape(-1, win)
            wmax = jnp.max(lg, axis=1)
            warg = jnp.argmax(lg, axis=1).astype(jnp.int32)
            logit, selw = top_k(wmax, cfg.max_proposals, exact=True)
            aw = gather.take_values(warg, selw)
            pw = gather.take_rows(p.reshape(-1, win * 4), selw)
            onew = (jax.lax.broadcasted_iota(
                jnp.int32, (cfg.max_proposals, win), 1) == aw[:, None])
            p = jnp.einsum("kw,kwf->kf", onew.astype(p.dtype),
                           pw.reshape(-1, win, 4),
                           precision=jax.lax.Precision.HIGHEST)
        else:
            logit, sel = top_k(logit, cfg.max_proposals)
            # row gather from the proposal table: serial dynamic-slices on
            # TPU (~0.3 ms hidden in the fused frontend) → two-stage one-hot
            # MXU contraction
            p = gather.take_rows(p, sel)
    keep, jmin, jmax = wireframe.match_proposals(
        p, logit, juncs, cfg.junction_match_threshold
    )
    cands = wireframe.dedup_pairs(
        keep, jmin, jmax, juncs, NUM_JUNCTIONS, cfg.max_lines, line_pred=p
    )
    line_scores, lines_adj = loi_apply(
        loi_params,
        cands.lines,
        cands.prop_lines,
        plnet_out["loi"],
        plnet_out["loi_thin"],
        plnet_out["loi_aux"],
        junc_xy=juncs.xy,
        pair_idx=cands.pairs,
    )
    decoded = wireframe.gate_lines(
        lines_adj,
        line_scores,
        cands.mask,
        (DETECT_SIZE, DETECT_SIZE),
        cfg.remove_borders,
        cfg.line_threshold,
        cfg.line_length_threshold,
    )
    scale4 = jnp.asarray([w_scale, h_scale, w_scale, h_scale], jnp.float32)
    lines_out = decoded.lines * scale4

    # -- keypoints ---------------------------------------------------------
    kps = topk_keypoints(heat, cfg.keypoint_threshold, cfg.remove_borders, cfg.max_keypoints)
    desc_chw = desc_map.transpose(2, 0, 1)  # (256, 64, 64)
    kp_desc = sample_descriptors(desc_chw, kps.xy, stride=8)
    scale2 = jnp.asarray([w_scale, h_scale], jnp.float32)
    kp_xy = kps.xy * scale2

    # -- junction keypoints (for BoW structure graph) ----------------------
    if detect_junctions:
        jkp = wireframe.collect_junction_keypoints(decoded, heat, cfg.max_junctions)
        junc_desc = sample_descriptors(desc_chw, jkp.xy, stride=8)
        junc_xy = jkp.xy * scale2
        junc_scores = jkp.score
        junc_mask = jkp.mask
    else:
        j = cfg.max_junctions
        junc_xy = jnp.zeros((j, 2), jnp.float32)
        junc_scores = jnp.zeros((j,), jnp.float32)
        junc_desc = jnp.zeros((j, 256), jnp.float32)
        junc_mask = jnp.zeros((j,), jnp.bool_)

    return FrameFeatures(
        keypoints=kp_xy,
        kp_scores=kps.score,
        kp_desc=kp_desc,
        kp_mask=kps.mask,
        lines=lines_out,
        line_scores=decoded.score,
        line_mask=decoded.mask,
        junctions=junc_xy,
        junc_scores=junc_scores,
        junc_desc=junc_desc,
        junc_mask=junc_mask,
    )


def detect_batch(plnet_out, sp_out, cfg: DetectorConfig, w_scale, h_scale,
                 detect_junctions, loi_apply, loi_params):
    """vmap the fixed-shape decode over the batch (e.g. both stereo views run
    in parallel instead of serial per-view decoding)."""

    def one(pl_i, sp_i):
        return _detect_single(pl_i, sp_i, cfg, w_scale, h_scale,
                              detect_junctions, loi_apply, loi_params)

    if sp_out is None:
        return jax.vmap(lambda p: one(p, None))(plnet_out)
    return jax.vmap(one)(plnet_out, sp_out)


class FeatureDetector:
    """Host wrapper owning parameters and the jitted detection programs.

    ``detect(images)`` takes a (B, H, W) float batch in [0, 1] at input
    resolution (any H, W — resized to 512² inside the graph, coordinates
    rescaled back, plnet.cpp:567-582) and returns batched FrameFeatures.
    """

    def __init__(self, config: DetectorConfig = DetectorConfig(), params=None, seed: int = 0):
        self.config = config
        self.plnet = PLNet(dtype=config.dtype)
        if config.loi_head == "s1":
            self.loi = LoiHeadS1(dtype=config.dtype)
        else:
            self.loi = LoiHead(dtype=config.dtype)
        self.superpoint = SuperPoint(dtype=config.dtype) if config.use_superpoint else None
        if params is None:
            params = self.init_params(seed)
        self.params = params
        self._jitted = {}

    def init_params(self, seed: int = 0):
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(seed), 3)
        dummy = jnp.zeros((1, DETECT_SIZE, DETECT_SIZE, 1), jnp.float32)
        params = {"plnet": self.plnet.init(k0, dummy)}
        params["loi"] = self._init_loi_params(k1)
        if self.superpoint is not None:
            params["superpoint"] = self.superpoint.init(k2, dummy)
        return params

    def _init_loi_params(self, key):
        """The reference's trained stage-1 checkpoint when using the
        import-compatible head (repo npz, falling back to converting the
        reference ONNX); random init otherwise."""
        if self.config.loi_head == "s1":
            from airslam_tpu.models import weights as wio

            ckpt = wio.checkpoint_path("plnet_s1.npz")
            if os.path.exists(ckpt):
                return wio.load_params(ckpt)
            onnx = "/root/reference/output/plnet_s1.onnx"
            if os.path.exists(onnx):
                return wio.import_plnet_s1(onnx)
        cand = jnp.zeros((self.config.max_lines, 4), jnp.float32)
        fmap = jnp.zeros((128, 128, 128), jnp.float32)
        thin = jnp.zeros((128, 128, 4), jnp.float32)
        return self.loi.init(key, cand, cand, fmap, thin, thin)

    # -- jitted core -------------------------------------------------------

    def _build(self, batch: int, hw: tuple, detect_junctions: bool):
        cfg = self.config
        h, w = hw
        w_scale = w / DETECT_SIZE
        h_scale = h / DETECT_SIZE

        plnet_apply = self.plnet.apply
        sp_apply = self.superpoint.apply if self.superpoint is not None else None
        loi_apply = self.loi.apply

        @jax.jit
        def run(params, images):
            x = images[..., None]  # (B, H, W, 1)
            if (h, w) != (DETECT_SIZE, DETECT_SIZE):
                x = jax.image.resize(
                    x, (batch, DETECT_SIZE, DETECT_SIZE, 1), "bilinear"
                )
            pl_out = plnet_apply(params["plnet"], x)
            sp_out = sp_apply(params["superpoint"], x) if sp_apply else None
            return detect_batch(pl_out, sp_out, cfg, w_scale, h_scale,
                                detect_junctions, loi_apply, params["loi"])

        return run

    def detect(self, images: np.ndarray, detect_junctions: bool = False) -> FrameFeatures:
        """images: (B, H, W) float32 in [0, 1]. Returns batched FrameFeatures."""
        images = jnp.asarray(images, jnp.float32)
        b, h, w = images.shape
        key = (b, h, w, detect_junctions)
        if key not in self._jitted:
            self._jitted[key] = self._build(b, (h, w), detect_junctions)
        return self._jitted[key](self.params, images)
