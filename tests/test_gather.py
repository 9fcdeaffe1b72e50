"""Unit tests for ops/gather.py — MXU one-hot row gathers.

These must be BIT-exact vs plain indexing: the whole point of the one-hot
formulation (one 1.0 per row, value·1 + Σ0) is that it is a lowering
strategy for TPU (serial dynamic-slice avoidance), not a numeric change.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from airslam_tpu.ops import gather


@pytest.mark.parametrize("rows,cols", [(7, 3), (64, 128), (4096, 4),
                                       (4097, 2), (49152, 4), (262144, 2)])
def test_take_rows_exact(rows, cols):
    rng = np.random.RandomState(rows % 1000)
    table = jnp.asarray(rng.randn(rows, cols).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, rows, size=257), jnp.int32)
    got = np.asarray(gather.take_rows(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_take_rows_bf16_exact():
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(4096, 64), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 4096, size=400), jnp.int32)
    got = np.asarray(gather.take_rows(table, idx).astype(jnp.float32))
    want = np.asarray(table.astype(jnp.float32))[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_take_rows_clips_out_of_range():
    table = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.asarray([-5, 0, 3, 99], jnp.int32)
    got = np.asarray(gather.take_rows(table, idx))
    want = np.asarray(table)[np.clip(np.asarray(idx), 0, 3)]
    np.testing.assert_array_equal(got, want)


def test_take_values_int_roundtrip():
    rng = np.random.RandomState(1)
    vals = jnp.asarray(rng.randint(0, 2**23, size=50000), jnp.int32)
    idx = jnp.asarray(rng.randint(0, 50000, size=1024), jnp.int32)
    got = np.asarray(gather.take_values(vals, idx))
    want = np.asarray(vals)[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)


def test_take_values_float():
    rng = np.random.RandomState(2)
    vals = jnp.asarray(rng.randn(300).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 300, size=64), jnp.int32)
    got = np.asarray(gather.take_values(vals, idx))
    np.testing.assert_array_equal(got, np.asarray(vals)[np.asarray(idx)])


def test_mutual_match_reduction_form_oracle():
    """mutual_match was rewritten gather-free (value-at-argmax == row max,
    mutuality as a plane reduction) — verify exact agreement with the
    indexing oracle across random shapes/masks."""
    from airslam_tpu.ops.match import mutual_match

    rng = np.random.RandomState(0)
    for trial in range(20):
        n0, n1 = rng.randint(3, 60), rng.randint(3, 60)
        s = jnp.asarray(rng.randn(n0, n1).astype(np.float32))
        m0 = jnp.asarray(rng.rand(n0) > 0.2)
        m1 = jnp.asarray(rng.rand(n1) > 0.2)
        got = mutual_match(s, m0, m1, 0.1)
        ms = np.where(np.asarray(m0)[:, None] & np.asarray(m1)[None, :],
                      np.asarray(s), -1e9)
        rb = ms.argmax(1)
        cb = ms.argmax(0)
        mut = cb[rb] == np.arange(n0)
        sc = np.exp(ms[np.arange(n0), rb])
        ok = mut & (sc > 0.1) & np.asarray(m0)
        assert np.array_equal(np.asarray(got.mask), ok), trial
        assert np.array_equal(np.asarray(got.idx1), np.where(ok, rb, -1)), trial
