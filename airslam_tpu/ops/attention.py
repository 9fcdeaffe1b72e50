"""Masked multi-head attention for the feature matchers.

The matcher workloads are ≤1024 tokens × 256 dim (light_glue.cpp:50-66), so a
whole attention block fits in one chip's VMEM. On TPU we provide two paths:

- :func:`mha` — plain XLA dot-product attention. XLA already fuses the
  softmax chain for these sizes; this is the default and the CPU-test path.
- :func:`flash_mha` — a Pallas flash-attention kernel (single (N, d) block
  per head resident in VMEM, fused softmax, no (N, N) HBM round trip) used on
  TPU for the fused frontend graph. Falls back to :func:`mha` off-TPU.

Both paths are numerically equivalent (tested in tests/test_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e9


def mha(q, k, v, kv_mask=None):
    """q: (H, Nq, D), k/v: (H, Nk, D), kv_mask: (Nk,) bool. Returns (H, Nq, D)."""
    d = q.shape[-1]
    logits = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    if kv_mask is not None:
        logits = jnp.where(kv_mask[None, None, :], logits, _NEG)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("hqk,hkd->hqd", w, v)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref):
    # One (Nq, D) query block per head against full (Nk, D) K/V in VMEM.
    q = q_ref[0]  # (Nq, D)
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    # Precision per matmul: bf16 operands use the native bf16 MXU pass with
    # f32 accumulation (Mosaic rejects a HIGHEST/fp32 contract on a bf16
    # lhs — "Bad lhs type"); f32 operands take HIGHEST. q/k and v can have
    # different dtypes (rotary embedding promotes q/k to f32 upstream).
    def _prec(dt):
        return (jax.lax.Precision.HIGHEST if dt == jnp.float32
                else jax.lax.Precision.DEFAULT)

    k = k.astype(q.dtype)
    logits = jnp.dot(
        q, k.T, preferred_element_type=jnp.float32, precision=_prec(q.dtype),
    ) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.where(mask_ref[0][None, :] > 0, logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=_prec(v.dtype),
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_call(q, k, v, mask_i32, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, nq, d = q.shape
    nk = k.shape[1]
    grid = (h,)
    return pl.pallas_call(
        _flash_kernel,
        out_shape=jax.ShapeDtypeStruct((h, nq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, mask_i32)


def flash_mha(q, k, v, kv_mask=None, interpret=None):
    """Pallas fused attention. On TPU runs compiled; elsewhere falls back to
    :func:`mha` unless ``interpret=True`` forces the Pallas interpreter
    (used by CPU tests to validate the kernel logic)."""
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = False
        if not on_tpu:
            return mha(q, k, v, kv_mask)
    nk = k.shape[1]
    if kv_mask is None:
        kv_mask = jnp.ones((nk,), jnp.bool_)
    mask_i32 = kv_mask.astype(jnp.int32)[None, :]
    return _flash_call(q, k, v, mask_i32, interpret=interpret)
