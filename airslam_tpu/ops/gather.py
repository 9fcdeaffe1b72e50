"""Row gathers as MXU one-hot contractions.

On TPU, ``table[idx]`` (``lax.gather``) lowers to a SERIAL dynamic-slice per
index — hundreds of microseconds for a few thousand rows inside the fused
frontend. A one-hot contraction fetches the same rows on the MXU in tens of
microseconds, and is **bit-exact**: each output row is ``1.0·row + Σ 0``
(the reference semantics are plain array indexing, e.g. the proposal
prefilter of plnet.cpp:468-475 and the junction offset lookup — this is a
lowering strategy, not a numeric change).

For large tables the dense one-hot ``(N, R)`` itself would be the biggest
tensor in the program (the round-2 lesson: a 262k-slot scatter plane cost
~134 MB/frame), so tables with many rows are gathered in TWO stages over a
factorization R = rh·rw: a one-hot row contraction against the
``(rh, rw·C)``-reshaped table, then a masked lane reduction — both
intermediates stay ~N·rw·C.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU matmuls downcast f32 operands to bf16 at DEFAULT precision; HIGHEST
# (bf16x3/x6 passes) represents each f32 operand exactly, so a one-hot row
# (exact 1.0/0.0) times an f32 table is still BIT-exact. For bf16 tables a
# single pass is already exact; HIGHEST costs nothing extra there.
_EXACT = jax.lax.Precision.HIGHEST

_SINGLE_STAGE_MAX_ROWS = 4096


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for ``table`` (R, C) float and ``idx`` (N,) int,
    computed with one-hot MXU contractions. Out-of-range indices are clipped
    (callers pad with in-range sentinels, matching ``jnp.take``'s clip mode
    on TPU)."""
    r, c = table.shape
    n = idx.shape[0]
    idx = jnp.clip(idx, 0, r - 1)
    if jax.default_backend() != "tpu":
        # CPU/GPU have real vector gathers; the dense one-hot would turn an
        # O(N·C) lookup into an O(N·R·C) matmul there. Same values (clip
        # semantics above), different lowering.
        return jnp.take(table, idx, axis=0)
    if r <= _SINGLE_STAGE_MAX_ROWS:
        io = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
        out = jnp.dot((io == idx[:, None]).astype(table.dtype), table,
                      preferred_element_type=jnp.float32, precision=_EXACT)
        return out.astype(table.dtype)
    rh = 1 << ((r.bit_length() - 1) // 2)
    while r % rh:
        rh >>= 1
    rw = r // rh
    if rh == 1:  # odd row count: fall back to the dense one-hot
        io = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
        out = jnp.dot((io == idx[:, None]).astype(table.dtype), table,
                      preferred_element_type=jnp.float32, precision=_EXACT)
        return out.astype(table.dtype)
    hi = idx // rw
    lo = idx % rw
    t2 = table.reshape(rh, rw * c)
    ioh = jax.lax.broadcasted_iota(jnp.int32, (n, rh), 1)
    rows = jnp.dot((ioh == hi[:, None]).astype(table.dtype), t2,
                   preferred_element_type=jnp.float32,
                   precision=_EXACT)  # (n, rw·c)
    iow = jax.lax.broadcasted_iota(jnp.int32, (n, rw), 1)
    m = (iow == lo[:, None]).astype(rows.dtype)
    out = jnp.einsum("nw,nwc->nc", m, rows.reshape(n, rw, c),
                     precision=_EXACT)
    return out.astype(table.dtype)


def take_values(values: jax.Array, idx: jax.Array) -> jax.Array:
    """``values[idx]`` for a 1-D ``values`` (float or int) — int values are
    round-tripped through f32, exact for magnitudes below 2**24 (every call
    site holds flat indices into ≤512² planes or ≤300² key spaces)."""
    if jnp.issubdtype(values.dtype, jnp.integer):
        out = take_rows(values.astype(jnp.float32)[:, None], idx)[:, 0]
        return jnp.round(out).astype(values.dtype)
    return take_rows(values[:, None], idx)[:, 0]
