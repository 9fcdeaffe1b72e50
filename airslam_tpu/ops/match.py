"""Match decoding and optimal transport.

Replaces ``filter_matches`` (src/light_glue.cpp:214-266), SuperGlue's
``decode`` (src/super_glue.cpp:339-367) and the log-domain Sinkhorn
``log_optimal_transport`` / ``log_sinkhorn_iterations``
(src/super_glue.cpp:369-435 — present but disabled in the reference; here it
is a first-class op, selectable per config).

Fixed-shape formulation: instead of building a variable-length match list, we
return per-row match indices with a validity mask; the host pairs them up.
Mutual-argmax is two reductions over the (N0, N1) score matrix — ideal VPU
work that fuses with the matcher's last layer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG = -1e9


class Matches(NamedTuple):
    idx1: jax.Array  # (N0,) int32 — index into image-1 keypoints, -1 if none
    score: jax.Array  # (N0,) — exp(log-score) of the match
    mask: jax.Array  # (N0,) bool


def mutual_match(
    scores: jax.Array,  # (N0, N1) log-domain scores
    mask0: jax.Array,  # (N0,) valid keypoints in image 0
    mask1: jax.Array,  # (N1,)
    threshold: float,  # on exp(score): 0.1 lightglue / 0.2 superglue
) -> Matches:
    """Mutual row/col argmax + exp threshold (light_glue.cpp:214-266)."""
    masked = jnp.where(mask0[:, None] & mask1[None, :], scores, jnp.full_like(scores, _NEG))
    row_best = jnp.argmax(masked, axis=1).astype(jnp.int32)  # (N0,)
    col_best = jnp.argmax(masked, axis=0).astype(jnp.int32)  # (N1,)
    # value-at-argmax == row max, and mutuality (col_best[row_best[i]] == i)
    # == ∃j: row_best[i]==j ∧ col_best[j]==i — both expressible as reductions
    # over the (N0, N1) plane already in registers, avoiding TPU serial
    # dynamic-slice gathers entirely
    row_val = jnp.max(masked, axis=1)
    n0, n1 = scores.shape
    ioj = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 1)
    ioi = jax.lax.broadcasted_iota(jnp.int32, (n0, n1), 0)
    mutual = jnp.any((ioj == row_best[:, None]) & (col_best[None, :] == ioi), axis=1)
    score = jnp.exp(row_val)
    ok = mutual & (score > threshold) & mask0
    return Matches(
        idx1=jnp.where(ok, row_best, -jnp.ones_like(row_best)),
        score=jnp.where(ok, score, jnp.zeros_like(score)),
        mask=ok,
    )


def log_sinkhorn(
    scores: jax.Array,  # (N0, N1)
    mask0: jax.Array,
    mask1: jax.Array,
    bin_score: jax.Array,  # scalar learned dustbin score
    iters: int,
) -> jax.Array:
    """Log-domain Sinkhorn with dustbin row/col (SuperGlue's optimal
    transport). Returns the (N0+1, N1+1) log transport plan; the inner
    (N0, N1) block feeds :func:`mutual_match`.

    Padded keypoints get score -inf against everything but the dustbin so the
    marginals stay consistent for any actual keypoint count.
    """
    n0, n1 = scores.shape
    m = jnp.sum(mask0.astype(scores.dtype))
    n = jnp.sum(mask1.astype(scores.dtype))

    pad = jnp.where(mask0[:, None] & mask1[None, :], scores, _NEG)
    couplings = jnp.full((n0 + 1, n1 + 1), _NEG, scores.dtype)
    couplings = couplings.at[:n0, :n1].set(pad)
    couplings = couplings.at[:n0, n1].set(jnp.where(mask0, bin_score, _NEG))
    couplings = couplings.at[n0, :n1].set(jnp.where(mask1, bin_score, _NEG))
    couplings = couplings.at[n0, n1].set(bin_score)

    # log marginals: each real keypoint has mass 1, dustbins absorb the rest.
    log_mu = jnp.concatenate(
        [jnp.where(mask0, 0.0, _NEG), jnp.log(jnp.maximum(n, 1.0))[None]]
    ) - jnp.log(m + n)
    log_nu = jnp.concatenate(
        [jnp.where(mask1, 0.0, _NEG), jnp.log(jnp.maximum(m, 1.0))[None]]
    ) - jnp.log(m + n)

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(couplings + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, None], axis=0)
        return u, v

    u0 = jnp.zeros((n0 + 1,), scores.dtype)
    v0 = jnp.zeros((n1 + 1,), scores.dtype)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    z = couplings + u[:, None] + v[None, :]
    return z + jnp.log(m + n)  # undo the normalization like SuperGlue does
