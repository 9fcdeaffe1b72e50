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


def make_rendered_batch(plnet_apply, plnet_params, key, image_size: int = 512):
    """One training example from a rendered affine pair. Returns
    (kpts0n, d0, m0, kpts1n, d1, m1, matched_mask, only0, only1); token count
    is the static corner budget."""
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.models.lightglue import normalize_keypoints
    from airslam_tpu.ops.gridsample import sample_descriptors

    kd, kj = jax.random.split(key)
    s0, s1 = synthgen.render_pair(kd)
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
    k0 = normalize_keypoints(c0, image_size, image_size, 0.5)
    k1 = normalize_keypoints(c1, image_size, image_size, 0.5)
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


def make_rendered_train_step(model: LightGlue, tx, plnet_apply, plnet_params):
    def train_step(state: TrainState, keys):
        def loss_fn(p):
            batch = jax.vmap(
                lambda k: make_rendered_batch(plnet_apply, plnet_params, k)
            )(keys)
            return rendered_match_loss(model, p, batch)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step
