"""Point matcher: LightGlue/SuperGlue as one jitted program with fixed-shape
decode.

Replaces ``PointMatcher`` (src/point_matcher.cc): keypoint normalization
(point_matcher.cc:39-49, scale 0.5 lightglue / 0.7 superglue), engine
inference, mutual-argmax decode (exp thresholds 0.1 / 0.2) and optional
fundamental-matrix RANSAC outlier rejection (point_matcher.cc:105-119).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airslam_tpu.models.lightglue import LightGlue, normalize_keypoints
from airslam_tpu.models.superglue import SuperGlue
from airslam_tpu.ops.match import Matches, mutual_match

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    matcher: int = 0  # 0 lightglue, 1 superglue (vo_euroc.yaml:10)
    image_width: int = 752
    image_height: int = 480
    max_keypoints: int = 512  # static token budget (engine profile ≤1024)
    sinkhorn_iterations: int = 0  # SuperGlue OT (reference ships it disabled)
    # Pallas flash attention is wired end-to-end but measured SLOWER than the
    # fused XLA path at this size (N=400, D=64/head: 0.56 ms vs 0.41 ms per
    # stereo pair on v5e — 36 tiny kernel launches/match can't beat one fused
    # XLA program). Flip on for larger token budgets (≥1k) where the (N, N)
    # HBM round trip starts to matter.
    use_flash: bool = False
    dtype: Any = jnp.float32


class PointMatcher:
    def __init__(self, config: MatcherConfig = MatcherConfig(), params=None, seed: int = 0):
        self.config = config
        if config.matcher == 0:
            self.model = LightGlue(dtype=config.dtype, use_flash=config.use_flash)
            self.threshold = 0.1
            self.norm_scale = 0.5
        else:
            self.model = SuperGlue(dtype=config.dtype,
                                   sinkhorn_iterations=config.sinkhorn_iterations)
            self.threshold = 0.2
            self.norm_scale = 0.7
        if params is None:
            params = self.init_params(seed)
        self.params = params
        self._jitted = None

    def init_params(self, seed: int = 0):
        n = self.config.max_keypoints
        k = jax.random.PRNGKey(seed)
        kpts = jnp.zeros((n, 2), jnp.float32)
        desc = jnp.zeros((n, 256), jnp.float32)
        mask = jnp.ones((n,), jnp.bool_)
        if self.config.matcher == 0:
            return self.model.init(k, kpts, desc, mask, kpts, desc, mask)
        sc = jnp.zeros((n,), jnp.float32)
        return self.model.init(k, kpts, sc, desc, mask, kpts, sc, desc, mask)

    def _build(self):
        cfg = self.config
        model_apply = self.model.apply
        thr = self.threshold
        scale = self.norm_scale
        is_lg = cfg.matcher == 0

        @jax.jit
        def run(params, kpts0, scores0, desc0, mask0, kpts1, scores1, desc1, mask1, threshold):
            nk0 = normalize_keypoints(kpts0, cfg.image_width, cfg.image_height, scale)
            nk1 = normalize_keypoints(kpts1, cfg.image_width, cfg.image_height, scale)
            if is_lg:
                scores, _, _ = model_apply(params, nk0, desc0, mask0, nk1, desc1, mask1)
            else:
                scores = model_apply(params, nk0, scores0, desc0, mask0, nk1, scores1, desc1, mask1)
            return mutual_match(scores, mask0, mask1, threshold)

        return run

    def _build_batched(self):
        cfg = self.config
        model_apply = self.model.apply
        scale = self.norm_scale
        is_lg = cfg.matcher == 0

        @jax.jit
        def run(params, kpts0, scores0, desc0, mask0, kpts1, scores1, desc1,
                mask1, threshold):
            def one(k0, s0, d0, m0, k1, s1, d1, m1):
                nk0 = normalize_keypoints(k0, cfg.image_width, cfg.image_height, scale)
                nk1 = normalize_keypoints(k1, cfg.image_width, cfg.image_height, scale)
                if is_lg:
                    scores, _, _ = model_apply(params, nk0, d0, m0, nk1, d1, m1)
                else:
                    scores = model_apply(params, nk0, s0, d0, m0, nk1, s1, d1, m1)
                return mutual_match(scores, m0, m1, threshold)

            return jax.vmap(one)(kpts0, scores0, desc0, mask0,
                                 kpts1, scores1, desc1, mask1)

        return run

    # -- public ------------------------------------------------------------

    def matching_points_batched(self, pairs, outlier_rejection: bool = False,
                                threshold: Optional[float] = None):
        """Match B (feats0, feats1) pairs in ONE device dispatch (vmapped
        model — e.g. the relocalization top-3 candidate loop, map_user.cc:
        360-376, becomes one batched program instead of B sequential ones).
        Returns a list of (match_pairs (M,2), scores (M,)) like
        :meth:`matching_points`."""
        if not pairs:
            return []
        if getattr(self, "_jitted_batched", None) is None:
            self._jitted_batched = self._build_batched()
        thr = self.threshold if threshold is None else threshold

        def stack(field):
            return jnp.asarray(np.stack([np.asarray(field(a, b)) for a, b in pairs]))

        m = self._jitted_batched(
            self.params,
            stack(lambda a, b: a.keypoints).astype(jnp.float32),
            stack(lambda a, b: a.kp_scores).astype(jnp.float32),
            stack(lambda a, b: a.kp_desc).astype(jnp.float32),
            stack(lambda a, b: a.kp_mask),
            stack(lambda a, b: b.keypoints).astype(jnp.float32),
            stack(lambda a, b: b.kp_scores).astype(jnp.float32),
            stack(lambda a, b: b.kp_desc).astype(jnp.float32),
            stack(lambda a, b: b.kp_mask),
            jnp.asarray(thr, jnp.float32),
        )
        out = []
        mask_b = np.asarray(m.mask)
        idx_b = np.asarray(m.idx1)
        sc_b = np.asarray(m.score)
        for bi, (f0, f1) in enumerate(pairs):
            i0 = np.nonzero(mask_b[bi])[0]
            i1 = idx_b[bi][i0]
            sc = sc_b[bi][i0]
            if outlier_rejection and len(i0) > 8 and cv2 is not None:
                p0 = np.asarray(f0.keypoints)[i0].astype(np.float32)
                p1 = np.asarray(f1.keypoints)[i1].astype(np.float32)
                _, inl = cv2.findFundamentalMat(p0, p1, cv2.FM_RANSAC, 20.0, 0.99)
                if inl is not None:
                    good = inl.ravel().astype(bool)
                    i0, i1, sc = i0[good], i1[good], sc[good]
            out.append((np.stack([i0, i1], axis=-1).astype(np.int32), sc))
        return out

    def match(
        self,
        kpts0, scores0, desc0, mask0,
        kpts1, scores1, desc1, mask1,
        threshold: Optional[float] = None,
    ) -> Matches:
        """All inputs (N, …) padded to ``max_keypoints``; device arrays or
        numpy. ``threshold`` overrides the default exp-score gate (runtime
        value — no recompile). Returns fixed-shape Matches."""
        if self._jitted is None:
            self._jitted = self._build()
        thr = self.threshold if threshold is None else threshold
        return self._jitted(
            self.params,
            jnp.asarray(kpts0, jnp.float32), jnp.asarray(scores0, jnp.float32),
            jnp.asarray(desc0, jnp.float32), jnp.asarray(mask0),
            jnp.asarray(kpts1, jnp.float32), jnp.asarray(scores1, jnp.float32),
            jnp.asarray(desc1, jnp.float32), jnp.asarray(mask1),
            jnp.asarray(thr, jnp.float32),
        )

    def matching_points(self, feats0, feats1, outlier_rejection: bool = False,
                        threshold: Optional[float] = None):
        """Reference-style convenience (``MatchingPoints``): returns an
        (M, 2) int array of match index pairs + (M,) scores, with optional
        fundamental-matrix RANSAC rejection (threshold 20 px, conf 0.99)."""
        m = self.match(
            feats0.keypoints, feats0.kp_scores, feats0.kp_desc, feats0.kp_mask,
            feats1.keypoints, feats1.kp_scores, feats1.kp_desc, feats1.kp_mask,
            threshold=threshold,
        )
        mask = np.asarray(m.mask)
        i0 = np.nonzero(mask)[0]
        i1 = np.asarray(m.idx1)[i0]
        sc = np.asarray(m.score)[i0]
        if outlier_rejection and len(i0) > 8 and cv2 is not None:
            p0 = np.asarray(feats0.keypoints)[i0].astype(np.float32)
            p1 = np.asarray(feats1.keypoints)[i1].astype(np.float32)
            _, inl = cv2.findFundamentalMat(p0, p1, cv2.FM_RANSAC, 20.0, 0.99)
            if inl is not None:
                good = inl.ravel().astype(bool)
                i0, i1, sc = i0[good], i1[good], sc[good]
        return np.stack([i0, i1], axis=-1).astype(np.int32), sc
