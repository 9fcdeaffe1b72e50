"""Per-stage frontend timing on the real TPU (evidence for perf work).

Times each stage of the fused stereo frontend separately with the bench.py
methodology: the stage runs inside ONE jitted ``lax.scan`` with an
inter-iteration data dependency and every output folded into the carry
(DCE-proof); per-iteration time is the differenced slope between a T=4 and a
T=64 scan, which cancels the remote-TPU tunnel's fixed dispatch cost.

Usage: python scripts/profile_frontend.py [--stage NAME ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(step_fn, example, reps=3):
    """step_fn(carry, x) -> carry must consume all work. Returns sec/iter."""

    def run(x, seed, T):
        def body(c, _):
            c2 = step_fn(c, x)
            return c2, None

        c, _ = jax.lax.scan(body, seed, None, length=T)
        return c

    times = {}
    for T in (4, 64):
        rj = jax.jit(lambda x, s, T=T: run(x, s, T))
        c = rj(example, jnp.asarray(0.0, jnp.float32))
        _ = float(np.asarray(c))
        best = 1e9
        for rep in range(reps):
            s = jnp.asarray(1e-5 * (rep + 1), jnp.float32)
            t0 = time.perf_counter()
            c = rj(example, s)
            _ = float(np.asarray(c))
            best = min(best, time.perf_counter() - t0)
        times[T] = best
    return (times[64] - times[4]) / 60.0


def consume(out):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", action="append", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    from airslam_tpu.frontend.detector import (
        DETECT_SIZE, DetectorConfig, FeatureDetector,
    )
    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher
    from airslam_tpu.models.lightglue import normalize_keypoints
    from airslam_tpu.models.plnet import NUM_JUNCTIONS
    from airslam_tpu.ops import wireframe
    from airslam_tpu.ops.detect import top_k, topk_keypoints
    from airslam_tpu.ops.gridsample import sample_descriptors
    from airslam_tpu.ops.match import mutual_match

    cfg = DetectorConfig(max_keypoints=400, use_superpoint=False, dtype=jnp.bfloat16)
    det = FeatureDetector(cfg, seed=0)
    pm = PointMatcher(MatcherConfig(matcher=0, max_keypoints=400, dtype=jnp.bfloat16), seed=0)
    plp = det.params["plnet"]
    loip = det.params["loi"]
    lgp = pm.params

    rng = np.random.RandomState(0)
    img2 = jnp.asarray(rng.rand(2, DETECT_SIZE, DETECT_SIZE, 1), jnp.float32)
    heat2 = jnp.asarray(rng.rand(2, 512, 512), jnp.float32) * 0.05
    jheat2 = jnp.asarray(rng.rand(2, 128, 128), jnp.float32)
    joff2 = jnp.asarray(rng.rand(2, 128, 128, 2), jnp.float32)
    logits2 = jnp.asarray(rng.randn(2, 128 * 128 * 3), jnp.float32)
    props2 = jnp.asarray(rng.rand(2, 128 * 128 * 3, 4), jnp.float32) * 127
    desc2 = jnp.asarray(rng.rand(2, 64, 64, 256), jnp.float32)
    loi2 = jnp.asarray(rng.rand(2, 128, 128, 128), jnp.float32)
    thin2 = jnp.asarray(rng.rand(2, 128, 128, 4), jnp.float32)
    aux2 = jnp.asarray(rng.rand(2, 128, 128, 4), jnp.float32)
    kpts2 = jnp.asarray(rng.rand(2, 400, 2), jnp.float32) * 500
    kdesc2 = jnp.asarray(rng.randn(2, 400, 256), jnp.float32)
    kmask2 = jnp.ones((2, 400), jnp.bool_)
    cand2 = jnp.asarray(rng.rand(2, cfg.max_lines, 4), jnp.float32) * 127

    def jiggle(x, c):
        return x + (c * 1e-6).astype(x.dtype)

    stages = {}

    def stage(name):
        def deco(fn):
            stages[name] = fn
            return fn

        return deco

    @stage("plnet_backbone")
    def _(c, _x):
        out = det.plnet.apply(plp, jiggle(img2, c))
        return consume(out) * 1e-9 + c

    @stage("kp_topk")
    def _(c, _x):
        out = jax.vmap(lambda h: topk_keypoints(h, 0.004, 4, 400))(jiggle(heat2, c))
        return consume(out) * 1e-9 + c

    @stage("kp_topk_exact")
    def _(c, _x):
        out = jax.vmap(lambda h: topk_keypoints(h, 0.004, 4, 400, exact=True))(jiggle(heat2, c))
        return consume(out) * 1e-9 + c

    @stage("junc_decode")
    def _(c, _x):
        out = jax.vmap(
            lambda h, o: wireframe.decode_junctions(h, o, NUM_JUNCTIONS)
        )(jiggle(jheat2, c), joff2)
        return consume(out) * 1e-9 + c

    @stage("prop_prefilter")
    def _(c, _x):
        out = jax.vmap(lambda l: top_k(l, 4096))(jiggle(logits2, c))
        return consume(out) * 1e-9 + c

    jxy2 = jnp.asarray(rng.rand(2, NUM_JUNCTIONS, 2), jnp.float32) * 127

    @stage("match_proposals")
    def _(c, _x):
        def one(p, l, jx):
            j = wireframe.Junctions(xy=jx, score=jnp.ones((NUM_JUNCTIONS,)),
                                    mask=jnp.ones((NUM_JUNCTIONS,), bool))
            return wireframe.match_proposals(jiggle(p, c), l, j, 5.0)

        out = jax.vmap(one)(props2[:, :4096], logits2[:, :4096], jxy2)
        return consume(out) * 1e-9 + c

    @stage("dedup_pairs")
    def _(c, _x):
        jxy = jnp.asarray(rng.rand(2, NUM_JUNCTIONS, 2), jnp.float32) * 127
        keep = logits2[:, :4096] > 0
        jmin = jnp.abs(logits2[:, :4096] * 37).astype(jnp.int32) % NUM_JUNCTIONS
        jmax = jnp.minimum(jmin + 1 + (jnp.abs(logits2[:, :4096] * 91).astype(jnp.int32) % 50),
                           NUM_JUNCTIONS - 1)

        def one(k, mn, mx, jx):
            j = wireframe.Junctions(xy=jx + (c * 1e-6).astype(jx.dtype),
                                    score=jnp.ones((NUM_JUNCTIONS,)),
                                    mask=jnp.ones((NUM_JUNCTIONS,), bool))
            return wireframe.dedup_pairs(k, mn, mx, j, NUM_JUNCTIONS, 512)

        out = jax.vmap(one)(keep, jmin, jmax, jxy)
        return consume(out) * 1e-9 + c

    @stage("loi_head")
    def _(c, _x):
        out = jax.vmap(lambda l, f, t, a: det.loi.apply(loip, l, l, f, t, a))(
            jiggle(cand2, c), loi2, thin2, aux2
        )
        return consume(out) * 1e-9 + c

    @stage("sample_desc")
    def _(c, _x):
        out = jax.vmap(
            lambda d, k: sample_descriptors(d.transpose(2, 0, 1), k, stride=8)
        )(jiggle(desc2, c), kpts2)
        return consume(out) * 1e-9 + c

    @stage("lightglue")
    def _(c, _x):
        nk0 = normalize_keypoints(kpts2[0], 752, 480, 0.5)
        nk1 = normalize_keypoints(kpts2[1], 752, 480, 0.5)
        scores, z0, z1 = pm.model.apply(
            lgp, nk0, jiggle(kdesc2[0], c), kmask2[0], nk1, kdesc2[1], kmask2[1]
        )
        m = mutual_match(scores, kmask2[0], kmask2[1], 0.1)
        return consume((scores, m)) * 1e-9 + c

    @stage("resize")
    def _(c, _x):
        x = jnp.zeros((2, 480, 752, 1), jnp.float32) + c * 1e-6
        out = jax.image.resize(x, (2, DETECT_SIZE, DETECT_SIZE, 1), "bilinear")
        return consume(out) * 1e-9 + c

    # whole-entry ablations: the fused program end-to-end, and detect-only
    from __graft_entry__ import entry

    entry_fn, entry_args = entry()
    eplp, eloip, elgp, _pair = entry_args
    pair_example = jnp.asarray(rng.rand(2, 480, 752), jnp.float32)

    @stage("entry_full")
    def _(c, _x):
        out = entry_fn(eplp, eloip, elgp, pair_example + (c * 1e-6).astype(jnp.float32))
        return consume(out) * 1e-9 + c

    from airslam_tpu.frontend.detector import detect_batch

    @stage("detect_batch_only")
    def _(c, _x):
        x = pair_example[..., None] + (c * 1e-6).astype(jnp.float32)
        x = jax.image.resize(x, (2, DETECT_SIZE, DETECT_SIZE, 1), "bilinear")
        pl_out = det.plnet.apply(plp, x)
        feats = detect_batch(pl_out, None, cfg, 752 / DETECT_SIZE, 480 / DETECT_SIZE,
                             False, det.loi.apply, loip)
        return consume(feats) * 1e-9 + c

    @stage("detect_batch_junc")
    def _(c, _x):
        # the mapping configuration: junctions collected in-graph
        x = pair_example[..., None] + (c * 1e-6).astype(jnp.float32)
        x = jax.image.resize(x, (2, DETECT_SIZE, DETECT_SIZE, 1), "bilinear")
        pl_out = det.plnet.apply(plp, x)
        feats = detect_batch(pl_out, None, cfg, 752 / DETECT_SIZE, 480 / DETECT_SIZE,
                             True, det.loi.apply, loip)
        return consume(feats) * 1e-9 + c

    @stage("junction_collect")
    def _(c, _x):
        # isolated: endpoint dedup + heat gather + junction desc sampling
        lines4 = jnp.asarray(rng.rand(2, cfg.max_lines, 4), jnp.float32) * 500
        jxy_i = (lines4 + (c * 1e-6).astype(jnp.float32)).astype(jnp.int32)
        dec = wireframe.DecodedLines(
            lines=lines4, score=jnp.ones((2, cfg.max_lines), jnp.float32),
            mask=jnp.ones((2, cfg.max_lines), bool),
            junction_xy=jxy_i,
            junction_valid=jnp.ones((2, cfg.max_lines, 2), bool),
        )
        def one(d, h, dm):
            jk = wireframe.collect_junction_keypoints(d, h, cfg.max_junctions)
            jd = sample_descriptors(dm.transpose(2, 0, 1), jk.xy, stride=8)
            return jk, jd
        out = jax.vmap(one)(dec, jiggle(heat2, c), desc2)
        return consume(out) * 1e-9 + c

    names = args.stage or list(stages)
    print(f"{'stage':22s} {'ms/frame':>10s}")
    total = 0.0
    for name in names:
        dt = slope_time(stages[name], None)
        total += dt
        print(f"{name:22s} {dt * 1e3:10.3f}", flush=True)
    print(f"{'TOTAL (sum)':22s} {total * 1e3:10.3f}")


if __name__ == "__main__":
    main()
