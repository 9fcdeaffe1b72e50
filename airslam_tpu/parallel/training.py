"""On-TPU fine-tuning of the matcher/detector models.

The reference consumes frozen TensorRT engines — it cannot train. Here the
models are JAX modules, so domain fine-tuning (e.g. the dark/thermal sequences
AirSLAM targets) runs on the same chips that serve inference. The training
step is the multi-chip showcase: batch sharded over the ``dp`` mesh axis,
attention projections sharded over ``tp`` (see
``parallel.mesh.shard_lightglue_params``), gradients reduced by XLA
collectives over ICI.

Self-supervised objective: descriptor clouds are re-observed under a known
permutation + noise (stand-in for homography-warped redetection); the matcher
maximizes the log-assignment of true correspondences — the LightGlue paper's
supervision with synthetic ground truth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from airslam_tpu.models.lightglue import LightGlue


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_batch(key, batch: int, n: int, noise: float = 0.05):
    """Synthetic supervision: (kpts0, desc0, kpts1, desc1, perm)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    kpts0 = jax.random.uniform(k1, (batch, n, 2), minval=-0.5, maxval=0.5)
    desc0 = jax.random.normal(k2, (batch, n, 256))
    desc0 = desc0 / jnp.linalg.norm(desc0, axis=-1, keepdims=True)
    perm = jax.vmap(lambda k: jax.random.permutation(k, n))(jax.random.split(k3, batch))
    desc1 = jnp.take_along_axis(desc0, perm[..., None], axis=1)
    desc1 = desc1 + noise * jax.random.normal(k4, desc1.shape)
    desc1 = desc1 / jnp.linalg.norm(desc1, axis=-1, keepdims=True)
    kpts1 = jnp.take_along_axis(kpts0, perm[..., None], axis=1)
    return kpts0, desc0, kpts1, desc1, perm


def match_loss(model: LightGlue, params, kpts0, desc0, kpts1, desc1, perm):
    """−mean log-assignment of the true correspondence (batched)."""

    def one(k0, d0, k1, d1, p):
        mask = jnp.ones((k0.shape[0],), jnp.bool_)
        scores, _, _ = model.apply(params, k0, d0, mask, k1, d1, mask)
        n = k0.shape[0]
        true_scores = scores[jnp.arange(n), p]
        return -jnp.mean(true_scores)

    return jnp.mean(jax.vmap(one)(kpts0, desc0, kpts1, desc1, perm))


def make_train_step(model: LightGlue, tx: optax.GradientTransformation):
    def train_step(state: TrainState, batch):
        kpts0, desc0, kpts1, desc1, perm = batch
        loss, grads = jax.value_and_grad(
            lambda p: match_loss(model, p, kpts0, desc0, kpts1, desc1, perm)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_train_state(model: LightGlue, n: int, lr: float = 1e-4, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    kpts = jnp.zeros((n, 2), jnp.float32)
    desc = jnp.zeros((n, 256), jnp.float32)
    mask = jnp.ones((n,), jnp.bool_)
    params = model.init(key, kpts, desc, mask, kpts, desc, mask)
    tx = optax.adam(lr)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


# ---------------------------------------------------------------------------
# Matcher training on REAL rendered descriptors: affine scene pairs are
# rendered (synthgen), the (frozen, trained) PLNet describes both views, and
# the exact corner correspondences supervise the assignment — matched pairs
# maximize their log-assignment, single-view corners minimize matchability
# (the LightGlue paper's supervision with rendered rather than permuted data).
# ---------------------------------------------------------------------------


def _heat_at(heat: jax.Array, pts: jax.Array) -> jax.Array:
    """Nearest-pixel heatmap values at (x, y) points — stands in for the
    detector's per-keypoint score at training time."""
    h, w = heat.shape
    x = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0, h - 1)
    return heat[y, x]


def make_rendered_batch(plnet_apply, plnet_params, key, image_size: int = 512,
                        norm_scale: float = 0.5, with_scores: bool = False,
                        augment: float = 1.0):
    """One training example from a rendered affine pair. Returns
    (kpts0n, d0, m0, kpts1n, d1, m1, matched_mask, only0, only1); token count
    is the static corner budget. With ``with_scores`` (SuperGlue's keypoint
    encoder consumes detection scores) the tuple gains per-keypoint heatmap
    scores after each kpts entry."""
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.models.lightglue import normalize_keypoints
    from airslam_tpu.ops.gridsample import sample_descriptors

    kd, kj = jax.random.split(key)
    s0, s1 = synthgen.render_pair(kd, augment=augment)
    imgs = jnp.stack([s0.image, s1.image])[..., None]
    out = plnet_apply(plnet_params, imgs)
    # jitter sampling locations like a real (noisy) detector
    jit0, jit1 = jax.random.uniform(kj, (2,) + s0.corners.shape, minval=-1.0, maxval=1.0)
    c0 = s0.corners + jit0
    c1 = s1.corners + jit1
    d0 = sample_descriptors(out["descriptors"][0].transpose(2, 0, 1), c0, 8)
    d1 = sample_descriptors(out["descriptors"][1].transpose(2, 0, 1), c1, 8)
    m0 = s0.corner_mask
    m1 = s1.corner_mask
    both = m0 & m1
    k0 = normalize_keypoints(c0, image_size, image_size, norm_scale)
    k1 = normalize_keypoints(c1, image_size, image_size, norm_scale)
    if with_scores:
        sc0 = _heat_at(out["scores"][0], c0)
        sc1 = _heat_at(out["scores"][1], c1)
        return k0, sc0, d0, m0, k1, sc1, d1, m1, both, m0 & ~m1, m1 & ~m0
    return k0, d0, m0, k1, d1, m1, both, m0 & ~m1, m1 & ~m0


def rendered_match_loss(model: LightGlue, params, batch):
    """batch: tuple of stacked make_rendered_batch outputs (B leading dim)."""

    def one(k0, d0, m0, k1, d1, m1, both, only0, only1):
        scores, z0, z1 = model.apply(params, k0, d0, m0, k1, d1, m1)
        diag = jnp.diagonal(scores)
        n_match = jnp.maximum(jnp.sum(both), 1.0)
        l_match = -jnp.sum(jnp.where(both, diag, 0.0)) / n_match
        l_un0 = -jnp.sum(jnp.where(only0, jax.nn.log_sigmoid(-z0), 0.0)) / jnp.maximum(
            jnp.sum(only0), 1.0)
        l_un1 = -jnp.sum(jnp.where(only1, jax.nn.log_sigmoid(-z1), 0.0)) / jnp.maximum(
            jnp.sum(only1), 1.0)
        return l_match + 0.5 * (l_un0 + l_un1)

    return jnp.mean(jax.vmap(one)(*batch))


def make_rendered_train_step(model: LightGlue, tx, plnet_apply, plnet_params,
                             augment: float = 1.0):
    def train_step(state: TrainState, keys):
        def loss_fn(p):
            batch = jax.vmap(
                lambda k: make_rendered_batch(plnet_apply, plnet_params, k,
                                              augment=augment)
            )(keys)
            return rendered_match_loss(model, p, batch)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


# ---------------------------------------------------------------------------
# SuperGlue (matcher: 1) on the same rendered pairs. Trained THROUGH its
# Sinkhorn optimal transport (return_full=True exposes the dustbin row/col) so
# the learned bin_score routes single-view corners to the dustbin and the
# inference-time exp > 0.2 mutual-argmax decode (super_glue.cpp:339-367)
# operates on genuine log transport probabilities.
# ---------------------------------------------------------------------------

from airslam_tpu.models.superglue import SG_SINKHORN_ITERS  # noqa: F401 (re-export)


def init_train_state_sg(model, n: int, lr: float = 1e-4, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    kpts = jnp.zeros((n, 2), jnp.float32)
    sc = jnp.zeros((n,), jnp.float32)
    desc = jnp.zeros((n, 256), jnp.float32)
    mask = jnp.ones((n,), jnp.bool_)
    params = model.init(key, kpts, sc, desc, mask, kpts, sc, desc, mask)
    tx = optax.adam(lr)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def rendered_match_loss_sg(model, params, batch):
    """Full-plan supervision: matched corners maximize their diagonal
    transport log-prob; single-view corners maximize their dustbin entry."""

    def one(k0, s0, d0, m0, k1, s1, d1, m1, both, only0, only1):
        z = model.apply(params, k0, s0, d0, m0, k1, s1, d1, m1)  # (N+1, N+1)
        diag = jnp.diagonal(z[:-1, :-1])
        l_match = -jnp.sum(jnp.where(both, diag, 0.0)) / jnp.maximum(jnp.sum(both), 1.0)
        l_un0 = -jnp.sum(jnp.where(only0, z[:-1, -1], 0.0)) / jnp.maximum(
            jnp.sum(only0), 1.0)
        l_un1 = -jnp.sum(jnp.where(only1, z[-1, :-1], 0.0)) / jnp.maximum(
            jnp.sum(only1), 1.0)
        return l_match + 0.5 * (l_un0 + l_un1)

    return jnp.mean(jax.vmap(one)(*batch))


def make_rendered_train_step_sg(model, tx, plnet_apply, plnet_params,
                                augment: float = 1.0):
    def train_step(state: TrainState, keys):
        def loss_fn(p):
            batch = jax.vmap(
                lambda k: make_rendered_batch(
                    plnet_apply, plnet_params, k, norm_scale=0.7,
                    with_scores=True, augment=augment)
            )(keys)
            return rendered_match_loss_sg(model, p, batch)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


# ---------------------------------------------------------------------------
# Detector-in-the-loop training: instead of GT-corner tokens, the matcher
# sees the FROZEN detector's actual top-k keypoints (duplicates, misses,
# localization noise — the inference distribution). Ground-truth
# correspondence comes from the known affine: mutual nearest neighbors of the
# warped view-0 detections within match_px.
# ---------------------------------------------------------------------------


def make_detected_batch(plnet_apply, plnet_params, key, k_tokens: int = 256,
                        image_size: int = 512, match_px: float = 3.0,
                        norm_scale: float = 0.5, with_scores: bool = False,
                        augment: float = 1.0, view: float = 1.0):
    """Returns (k0n, [s0,] d0, m0, k1n, [s1,] d1, m1, tgt, neg0, neg1):
    tgt[i] is the matching view-1 token index or −1; neg0/neg1 flag tokens
    that are DEFINITELY unmatched (no cross-view detection within
    2·match_px). Tokens in the gray zone — typically duplicate detections of
    a matched corner, whose descriptors are indistinguishable from their
    matched twin — are excluded from the unmatchability supervision."""
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.models.lightglue import normalize_keypoints
    from airslam_tpu.ops.detect import topk_keypoints
    from airslam_tpu.ops.gridsample import sample_descriptors

    s0, s1, A, t = synthgen.render_pair_with_affine(key, augment=augment,
                                                    view=view)
    imgs = jnp.stack([s0.image, s1.image])[..., None]
    out = plnet_apply(plnet_params, imgs)
    kp0 = topk_keypoints(out["scores"][0], 0.004, 4, k_tokens)
    kp1 = topk_keypoints(out["scores"][1], 0.004, 4, k_tokens)
    d0 = sample_descriptors(out["descriptors"][0].transpose(2, 0, 1), kp0.xy, 8)
    d1 = sample_descriptors(out["descriptors"][1].transpose(2, 0, 1), kp1.xy, 8)

    p0w = kp0.xy @ A.T + t
    d2 = jnp.sum((p0w[:, None, :] - kp1.xy[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(kp0.mask[:, None] & kp1.mask[None, :], d2, 1e12)
    j_of_i = jnp.argmin(d2, axis=1)
    i_of_j = jnp.argmin(d2, axis=0)
    best0 = jnp.min(d2, axis=1)
    best1 = jnp.min(d2, axis=0)
    mutual = i_of_j[j_of_i] == jnp.arange(k_tokens)
    matched = mutual & (best0 < match_px ** 2) & kp0.mask
    tgt = jnp.where(matched, j_of_i, -1).astype(jnp.int32)
    far2 = (2.0 * match_px) ** 2
    neg0 = kp0.mask & (best0 > far2)
    neg1 = kp1.mask & (best1 > far2)

    k0n = normalize_keypoints(kp0.xy, image_size, image_size, norm_scale)
    k1n = normalize_keypoints(kp1.xy, image_size, image_size, norm_scale)
    if with_scores:
        return (k0n, kp0.score, d0, kp0.mask, k1n, kp1.score, d1, kp1.mask,
                tgt, neg0, neg1)
    return k0n, d0, kp0.mask, k1n, d1, kp1.mask, tgt, neg0, neg1


def detected_match_loss(model: LightGlue, params, batch):
    def one(k0, d0, m0, k1, d1, m1, tgt, neg0, neg1):
        scores, z0, z1 = model.apply(params, k0, d0, m0, k1, d1, m1)
        matched = tgt >= 0
        sc = jnp.take_along_axis(scores, jnp.maximum(tgt, 0)[:, None], axis=1)[:, 0]
        l_match = -jnp.sum(jnp.where(matched, sc, 0.0)) / jnp.maximum(
            jnp.sum(matched), 1.0)
        l0 = -jnp.sum(jnp.where(neg0, jax.nn.log_sigmoid(-z0), 0.0)) / jnp.maximum(
            jnp.sum(neg0), 1.0)
        l1 = -jnp.sum(jnp.where(neg1, jax.nn.log_sigmoid(-z1), 0.0)) / jnp.maximum(
            jnp.sum(neg1), 1.0)
        return l_match + 0.5 * (l0 + l1)

    return jnp.mean(jax.vmap(one)(*batch))


def detected_match_loss_sg(model, params, batch):
    def one(k0, s0, d0, m0, k1, s1, d1, m1, tgt, neg0, neg1):
        z = model.apply(params, k0, s0, d0, m0, k1, s1, d1, m1)  # (N+1, N+1)
        matched = tgt >= 0
        zin = z[:-1, :-1]
        sc = jnp.take_along_axis(zin, jnp.maximum(tgt, 0)[:, None], axis=1)[:, 0]
        l_match = -jnp.sum(jnp.where(matched, sc, 0.0)) / jnp.maximum(
            jnp.sum(matched), 1.0)
        l0 = -jnp.sum(jnp.where(neg0, z[:-1, -1], 0.0)) / jnp.maximum(
            jnp.sum(neg0), 1.0)
        l1 = -jnp.sum(jnp.where(neg1, z[-1, :-1], 0.0)) / jnp.maximum(
            jnp.sum(neg1), 1.0)
        return l_match + 0.5 * (l0 + l1)

    return jnp.mean(jax.vmap(one)(*batch))


def make_detected_train_step(model, tx, plnet_apply, plnet_params,
                             superglue: bool = False, k_tokens: int = 256,
                             augment: float = 1.0, view: float = 1.0):
    loss = detected_match_loss_sg if superglue else detected_match_loss
    scale = 0.7 if superglue else 0.5

    def train_step(state: TrainState, keys):
        def loss_fn(p):
            batch = jax.vmap(
                lambda k: make_detected_batch(
                    plnet_apply, plnet_params, k, k_tokens=k_tokens,
                    norm_scale=scale, with_scores=superglue, augment=augment,
                    view=view)
            )(keys)
            return loss(model, p, batch)

        l, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), l

    return train_step
