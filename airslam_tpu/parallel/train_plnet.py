"""On-TPU detector training on synthetic shapes (PLNet stage-0 + LOI head,
and SuperPoint) — the bootstrap the reference cannot do (it ships frozen
TensorRT engines; no stage-0/SuperPoint checkpoint is included in the repo).

Supervision (airslam_tpu.frontend.synthgen renders exact ground truth):
- keypoint head: SuperPoint's 65-way cell cross-entropy (8×8 pixel classes +
  dustbin) on corner cells;
- junction head: BCE heatmap + masked L1 sub-cell offsets at stride 4;
- line-proposal head: per-cell endpoint regression (min over the 3 proposals)
  + proposal-logit BCE on segment-center cells (HAWP-style supervision);
- LOI verification head (stage-1 architecture, init from the imported
  reference checkpoint): BCE separating true segments from junction-pair
  decoys, sampled on the live feature maps;
- descriptors: InfoNCE over exact corner correspondences between two
  photometrically-independent renders related by a known affine.

Data generation, loss, and update all run inside one jitted step; the batch
shards over the mesh's ``dp`` axis (see apps/train_plnet.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from airslam_tpu.frontend import synthgen
from airslam_tpu.ops.gridsample import sample_descriptors

SIZE = synthgen.SIZE
GRID8 = SIZE // 8  # 64
GRID4 = SIZE // 4  # 128
NEG_PAIRS = synthgen.MAX_SEGMENTS  # LOI decoys per image


class Targets(NamedTuple):
    kp_label: jax.Array  # (64, 64) int32 in [0, 64]; 64 = dustbin
    junc_heat: jax.Array  # (128, 128) {0, 1}
    junc_off: jax.Array  # (128, 128, 2) in [0, 1)
    junc_mask: jax.Array  # (128, 128) bool
    line_target: jax.Array  # (128, 128, 4) endpoints in 128-grid coords
    line_mask: jax.Array  # (128, 128) bool — cells holding a segment center


def scene_targets(scene: synthgen.Scene) -> Targets:
    """Rasterize ground truth onto the head grids (jittable, static shapes)."""
    c = scene.corners
    cm = scene.corner_mask
    cx = jnp.clip(c[:, 0].astype(jnp.int32), 0, SIZE - 1)
    cy = jnp.clip(c[:, 1].astype(jnp.int32), 0, SIZE - 1)

    kp_label = jnp.full((GRID8, GRID8), 64, jnp.int32)
    within = (cy % 8) * 8 + cx % 8
    cell_y, cell_x = cy // 8, cx // 8
    # invalid corners scatter to a dummy slot
    cell_y = jnp.where(cm, cell_y, GRID8 - 1)
    cell_x = jnp.where(cm, cell_x, GRID8 - 1)
    within = jnp.where(cm, within, 64)
    # min() keeps a deterministic winner on collisions and never lifts the
    # dustbin (64) above a real label
    kp_label = kp_label.at[cell_y, cell_x].min(within)

    jx = c[:, 0] / 4.0
    jy = c[:, 1] / 4.0
    jcx = jnp.clip(jx.astype(jnp.int32), 0, GRID4 - 1)
    jcy = jnp.clip(jy.astype(jnp.int32), 0, GRID4 - 1)
    jcx = jnp.where(cm, jcx, GRID4 - 1)
    jcy = jnp.where(cm, jcy, GRID4 - 1)
    heat = jnp.zeros((GRID4, GRID4), jnp.float32).at[jcy, jcx].max(
        cm.astype(jnp.float32)
    )
    off = jnp.zeros((GRID4, GRID4, 2), jnp.float32)
    off = off.at[jcy, jcx].set(
        jnp.where(cm[:, None], jnp.stack([jx - jcx, jy - jcy], -1), 0.0)
    )
    jmask = heat > 0.5

    seg4 = scene.segments / 4.0  # (S, 4) in 128-grid
    ctr = 0.5 * (seg4[:, 0:2] + seg4[:, 2:4])
    sm = scene.segment_mask
    scx = jnp.clip(ctr[:, 0].astype(jnp.int32), 0, GRID4 - 1)
    scy = jnp.clip(ctr[:, 1].astype(jnp.int32), 0, GRID4 - 1)
    scx = jnp.where(sm, scx, GRID4 - 1)
    scy = jnp.where(sm, scy, GRID4 - 1)
    line_t = jnp.zeros((GRID4, GRID4, 4), jnp.float32)
    line_t = line_t.at[scy, scx].set(jnp.where(sm[:, None], seg4, 0.0))
    line_m = jnp.zeros((GRID4, GRID4), bool).at[scy, scx].max(sm)
    return Targets(kp_label, heat, off, jmask, line_t, line_m)


def _bce(prob, target, pos_weight=1.0, eps=1e-6):
    prob = jnp.clip(prob, eps, 1 - eps)
    return -(pos_weight * target * jnp.log(prob) + (1 - target) * jnp.log(1 - prob))


def detector_loss(plnet_out, tgt: Targets, key, loi_apply=None, loi_params=None,
                  scene: synthgen.Scene = None):
    """Per-image loss terms (dict) from stage-0 outputs + targets."""
    losses = {}
    # keypoint 65-way CE
    ce = optax.softmax_cross_entropy_with_integer_labels(
        plnet_out["kp_logits"], tgt.kp_label
    )
    losses["kp"] = jnp.mean(ce)

    # junction heatmap + offsets
    npos = jnp.maximum(jnp.sum(tgt.junc_heat), 1.0)
    pw = (GRID4 * GRID4 - npos) / npos
    losses["junc"] = jnp.mean(_bce(plnet_out["junc_heat"], tgt.junc_heat, pw)) / (1 + pw) * 2
    off_l1 = jnp.abs(plnet_out["junc_offset"] - tgt.junc_off).sum(-1)
    losses["junc_off"] = jnp.sum(off_l1 * tgt.junc_mask) / npos

    # line proposals: endpoint regression (best of 3) + logit BCE
    pred = plnet_out["line_pred"]  # (128, 128, 3, 4)
    logit = plnet_out["line_logit"]  # (128, 128, 3)
    err = jnp.abs(pred - tgt.line_target[:, :, None, :]).sum(-1)  # (128,128,3)
    best = jnp.argmin(err, axis=-1)
    best_err = jnp.take_along_axis(err, best[..., None], axis=-1)[..., 0]
    nctr = jnp.maximum(jnp.sum(tgt.line_mask), 1.0)
    losses["line_reg"] = jnp.sum(best_err * tgt.line_mask) / nctr
    logit_t = (jax.nn.one_hot(best, 3) * tgt.line_mask[..., None]).astype(jnp.float32)
    lw = jnp.where(tgt.line_mask[..., None], 60.0, 1.0)
    losses["line_logit"] = jnp.mean(
        optax.sigmoid_binary_cross_entropy(logit, logit_t) * lw
    )

    # LOI verification head on live feature maps. Candidates must match the
    # INFERENCE distribution — arbitrary detected-junction pairs — so decoys
    # are random GT-corner pairs (corners ≈ what the junction head detects),
    # and every candidate is labeled geometrically: positive iff its endpoint
    # pair lies on some GT segment.
    if loi_apply is not None:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        seg4 = scene.segments / 4.0
        s = seg4.shape[0]
        pos = seg4 + jax.random.uniform(k1, seg4.shape, minval=-0.4, maxval=0.4)
        c4 = scene.corners / 4.0
        nc = c4.shape[0]
        i = jax.random.randint(k2, (2 * NEG_PAIRS,), 0, nc)
        j = jax.random.randint(k3, (2 * NEG_PAIRS,), 0, nc)
        rand_pairs = jnp.concatenate([c4[i], c4[j]], axis=-1)
        rand_valid = (
            scene.corner_mask[i] & scene.corner_mask[j] & (i != j)
            & (jnp.linalg.norm(c4[i] - c4[j], axis=-1) > 4.0)
        )
        cands = jnp.concatenate([pos, rand_pairs], axis=0)
        valid = jnp.concatenate([scene.segment_mask, rand_valid])

        # geometric label: LYING-ON criterion — a candidate is a true line
        # iff BOTH endpoints lie on the SAME GT segment (sub-chords of a
        # straight segment are collinear, hence visually perfect lines).
        # The earlier symmetric endpoint-pair distance mislabeled such
        # sub-chords negative, which became contradictory once the checker
        # grid supplied many collinear corner pairs and measurably degraded
        # the LOI head's precision.
        def seg_pt_dist(p, g):  # point (2,) to segment (4,)
            a, b = g[0:2], g[2:4]
            d = b - a
            L2 = jnp.maximum(d @ d, 1e-6)
            t = jnp.clip(((p - a) @ d) / L2, 0.0, 1.0)
            return jnp.linalg.norm(p - (a + t * d))

        def lie_dist(c, g):  # (4,), (4,) -> scalar
            return jnp.maximum(seg_pt_dist(c[0:2], g), seg_pt_dist(c[2:4], g))

        dmat = jax.vmap(lambda c: jax.vmap(lambda g: lie_dist(c, g))(seg4))(cands)
        dmat = jnp.where(scene.segment_mask[None, :], dmat, 1e9)
        dmin = jnp.min(dmat, axis=1)
        labels = (dmin < 1.0).astype(jnp.float32)
        # ambiguous band: neither clearly on a segment nor clearly off
        valid = valid & ((dmin < 1.0) | (dmin > 2.5))

        # the aux path samples along each candidate's REPRESENTATIVE
        # PROPOSAL at inference (dedup_pairs picks the first matched
        # proposal — approximately the candidate chord + regression noise).
        # Train with the same distribution: a ±2-cell-jittered copy of the
        # candidate. Training with prop == cand exactly let the head lean on
        # a clean aux signal it never sees at inference (measured: 320/512
        # accepted at 52% precision vs 75% with self-prop inputs).
        prop = cands + jax.random.uniform(k4, cands.shape, minval=-2.0, maxval=2.0)
        score, _ = loi_apply(
            loi_params, cands, prop,
            plnet_out["loi"], plnet_out["loi_thin"], plnet_out["loi_aux"],
        )
        bce = _bce(score, labels)
        losses["loi"] = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return losses


def descriptor_loss(desc0, desc1, s0: synthgen.Scene, s1: synthgen.Scene,
                    tau: float = 0.1):
    """InfoNCE over exact corner correspondences of an affine pair.
    desc: (64, 64, 256) HWC stride-8 maps."""
    d0 = sample_descriptors(desc0.transpose(2, 0, 1), s0.corners, stride=8)
    d1 = sample_descriptors(desc1.transpose(2, 0, 1), s1.corners, stride=8)
    m = s0.corner_mask & s1.corner_mask
    logits = (d0 @ d1.T) / tau  # (C, C)
    neg = jnp.asarray(-1e9, logits.dtype)
    logits = jnp.where(m[None, :], logits, neg)
    labels = jnp.arange(d0.shape[0])
    ce_r = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    ce_c = optax.softmax_cross_entropy_with_integer_labels(
        jnp.where(m[:, None], logits, neg).T, labels
    )
    n = jnp.maximum(jnp.sum(m), 1.0)
    return (jnp.sum((ce_r + ce_c) * 0.5 * m)) / n


WEIGHTS = {
    "kp": 1.0, "junc": 1.0, "junc_off": 0.25, "line_reg": 0.1,
    "line_logit": 1.0, "loi": 0.5, "desc": 1.0,
}


def make_plnet_train_step(plnet, loi, tx, with_desc: bool = True,
                          augment: float = 1.0):
    """Returns train_step(params, opt_state, key) -> (params, opt_state,
    loss, metrics). Data is generated inside the step (device-resident).
    ``augment`` is the photometric-augmentation strength (brightness/gamma/
    contrast/vignette/noise, independent per view) — the illumination-
    robustness training knob; 0 disables."""

    def loss_fn(params, key):
        kd, kl = jax.random.split(key)
        if with_desc:
            s0, s1 = synthgen.render_pair(kd, augment=augment)
            imgs = jnp.stack([s0.image, s1.image])[..., None]
            out = plnet.apply(params["plnet"], imgs)
            out0 = jax.tree_util.tree_map(lambda t: t[0], out)
            out1 = jax.tree_util.tree_map(lambda t: t[1], out)
            terms = detector_loss(
                out0, scene_targets(s0), kl,
                loi_apply=loi.apply, loi_params=params["loi"], scene=s0,
            )
            terms["desc"] = descriptor_loss(
                out0["descriptors"], out1["descriptors"], s0, s1
            )
        else:
            s0 = synthgen.render_scene(kd, augment=augment)
            out0 = jax.tree_util.tree_map(
                lambda t: t[0], plnet.apply(params["plnet"], s0.image[None, ..., None])
            )
            terms = detector_loss(
                out0, scene_targets(s0), kl,
                loi_apply=loi.apply, loi_params=params["loi"], scene=s0,
            )
        total = sum(WEIGHTS[k] * v for k, v in terms.items())
        return total, terms

    def batched_loss(params, keys):
        total, terms = jax.vmap(lambda k: loss_fn(params, k))(keys)
        return jnp.mean(total), jax.tree_util.tree_map(jnp.mean, terms)

    def train_step(params, opt_state, keys):
        (loss, terms), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            params, keys
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, terms

    return train_step


def make_superpoint_distill_step(sp, tx, plnet_apply, plnet_params,
                                 augment: float = 1.0):
    """SuperPoint with its descriptor space DISTILLED onto the (frozen)
    trained PLNet stage-0: keypoint CE as usual, but descriptors at GT
    corners regress PLNet's (cosine). The reference pairs use_superpoint: 1
    maps with use_superpoint: 0 relocalization (vo_euroc.yaml:2 vs
    reloc_euroc.yaml:5), which only works when the two nets share one
    descriptor space — this is the training-side counterpart."""

    def loss_fn(params, key):
        s0, s1 = synthgen.render_pair(key, augment=augment)
        imgs = jnp.stack([s0.image, s1.image])[..., None]
        out = sp.apply(params, imgs)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out["kp_logits"][0], scene_targets(s0).kp_label
        ).mean()
        pl = jax.lax.stop_gradient(plnet_apply(plnet_params, imgs)["descriptors"])

        def corner_descs(dmap, corners):
            return sample_descriptors(dmap.transpose(2, 0, 1), corners, stride=8)

        dist = 0.0
        for v, s in ((0, s0), (1, s1)):
            dsp = corner_descs(out["descriptors"][v].astype(jnp.float32), s.corners)
            dpl = corner_descs(pl[v].astype(jnp.float32), s.corners)
            cos = jnp.sum(dsp * dpl, axis=-1)
            m = s.corner_mask
            dist = dist + jnp.sum(jnp.where(m, 1.0 - cos, 0.0)) / jnp.maximum(
                jnp.sum(m), 1.0)
        dist = dist * 0.5
        return ce + 4.0 * dist, {"kp": ce, "distill": dist}

    def batched_loss(params, keys):
        total, terms = jax.vmap(lambda k: loss_fn(params, k))(keys)
        return jnp.mean(total), jax.tree_util.tree_map(jnp.mean, terms)

    def train_step(params, opt_state, keys):
        (loss, terms), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            params, keys
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, terms

    return train_step


def make_superpoint_train_step(sp, tx, augment: float = 1.0):
    """SuperPoint: keypoint CE + descriptor InfoNCE on affine pairs."""

    def loss_fn(params, key):
        s0, s1 = synthgen.render_pair(key, augment=augment)
        imgs = jnp.stack([s0.image, s1.image])[..., None]
        out = sp.apply(params, imgs)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out["kp_logits"][0], scene_targets(s0).kp_label
        ).mean()
        dl = descriptor_loss(out["descriptors"][0], out["descriptors"][1], s0, s1)
        return ce + dl, {"kp": ce, "desc": dl}

    def batched_loss(params, keys):
        total, terms = jax.vmap(lambda k: loss_fn(params, k))(keys)
        return jnp.mean(total), jax.tree_util.tree_map(jnp.mean, terms)

    def train_step(params, opt_state, keys):
        (loss, terms), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            params, keys
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, terms

    return train_step
