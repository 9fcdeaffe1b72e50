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
