"""Fused bilinear-sampling Pallas kernel vs the XLA one-hot einsum oracle
(models/plnet._onnx_bilerp) — exact corner semantics, border cases, bf16
rounding, padding, and shape handling (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airslam_tpu.models import plnet
from airslam_tpu.ops import bilerp_pallas


def _oracle(fmap, x, y):
    # the einsum path (never the pallas dispatch: f32, or CPU backend)
    return plnet._onnx_bilerp(fmap, x, y)


@pytest.mark.parametrize("c", [4, 128])
def test_matches_oracle_f32(c):
    rng = np.random.RandomState(0)
    fmap = jnp.asarray(rng.randn(128, 128, c), jnp.float32)
    x = jnp.asarray(rng.uniform(-1.5, 129.5, (300,)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1.5, 129.5, (300,)), jnp.float32)
    got = bilerp_points = bilerp_pallas.bilerp_points(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
    assert bilerp_points.shape == (300, c)


def test_matches_oracle_bf16():
    """bf16 maps: the kernel rounds weights to bf16 like the einsum path but
    keeps the row accumulation in f32 — agreement within bf16 grid."""
    rng = np.random.RandomState(1)
    fmap = jnp.asarray(rng.randn(128, 128, 4), jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 127, (512, 30)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 127, (512, 30)), jnp.float32)
    got = bilerp_pallas.bilerp_points(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    assert got.shape == want.shape == (512, 30, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_border_semantics():
    """Far-border samples carry ZERO total weight (x0==x1 → w0+w1 = 0), and
    below-0 samples extrapolate — the exact stage-1 ONNX arithmetic."""
    fmap = jnp.ones((128, 128, 4), jnp.float32) * 3.0
    x = jnp.asarray([127.0, 127.5, -0.5, 5.0], jnp.float32)
    y = jnp.asarray([5.0, 5.0, 5.0, 127.0], jnp.float32)
    got = bilerp_pallas.bilerp_points(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # x = 127 exactly (== W−1): x1 clamps onto x0, weights sum to 0
    assert abs(float(got[0, 0])) < 1e-6


def test_padding_unaffected_by_tail():
    """N not a multiple of the block: padded lanes must not leak into the
    returned slice."""
    rng = np.random.RandomState(2)
    fmap = jnp.asarray(rng.randn(128, 128, 4), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 127, (13,)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 127, (13,)), jnp.float32)
    got = bilerp_pallas.bilerp_points(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_block_size_heuristic():
    assert bilerp_pallas._block_n(128, 4) == 512
    assert bilerp_pallas._block_n(128, 128) == 64
    assert bilerp_pallas._block_n(128, 4096) == 8


def test_onnx_bilerp_dispatch_is_cpu_safe():
    """On the CPU backend the bf16 einsum path must still be taken (pallas
    only engages on TPU) — guards the gating in plnet._onnx_bilerp."""
    assert jax.default_backend() == "cpu"
    rng = np.random.RandomState(3)
    fmap = jnp.asarray(rng.randn(64, 64, 4), jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 63, (40,)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 63, (40,)), jnp.float32)
    out = plnet._onnx_bilerp(fmap, x, y)  # must not require pallas/TPU
    assert out.shape == (40, 4)


@pytest.mark.parametrize("c", [4, 128])
def test_lane_packed_matches_oracle_f32(c):
    """bilerp_points_t: lane-packed points, channel-major output."""
    rng = np.random.RandomState(4)
    fmap = jnp.asarray(rng.randn(128, 128, c), jnp.float32)
    x = jnp.asarray(rng.uniform(-1.5, 129.5, (300,)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1.5, 129.5, (300,)), jnp.float32)
    got = bilerp_pallas.bilerp_points_t(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    assert got.shape == (c, 300)
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_lane_packed_matches_oracle_bf16_shaped():
    """The LOI-head thin/aux shape: (L, 30) points on a bf16 4-channel map;
    output (4, L, 30) must match the einsum oracle's (L, 30, 4)."""
    rng = np.random.RandomState(5)
    fmap = jnp.asarray(rng.randn(128, 128, 4), jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 127, (512, 30)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 127, (512, 30)), jnp.float32)
    got = bilerp_pallas.bilerp_points_t(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    assert got.shape == (4, 512, 30)
    np.testing.assert_allclose(np.asarray(got).transpose(1, 2, 0),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_lane_packed_large_map_falls_back(monkeypatch):
    """Maps with C·W > 512 can't tile the lane-packed (nbr, 128) coordinate
    blocks legally under Mosaic (nbr < 8 is neither divisible by 8 nor equal
    to the row count): bilerp_points_t must route them through the row-major
    kernel. Interpret mode never checks tiling, so this pins the DISPATCH —
    the compiled-on-TPU legality is gated by scripts/verify_tpu.py."""
    called = {}
    orig = bilerp_pallas._call_t

    def spy(*a, **k):
        called["lane_packed"] = True
        return orig(*a, **k)

    monkeypatch.setattr(bilerp_pallas, "_call_t", spy)
    rng = np.random.RandomState(6)
    fmap = jnp.asarray(rng.randn(128, 128, 16), jnp.float32)  # C·W = 2048
    x = jnp.asarray(rng.uniform(-1.5, 129.5, (300,)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1.5, 129.5, (300,)), jnp.float32)
    got = bilerp_pallas.bilerp_points_t(fmap, x, y, interpret=True)
    assert "lane_packed" not in called, "large map must not use lane-packed"
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(_oracle(fmap, x, y)),
                               rtol=2e-6, atol=2e-6)


def test_lane_packed_border_and_padding():
    fmap = jnp.ones((128, 128, 4), jnp.float32) * 3.0
    x = jnp.asarray([127.0, 127.5, -0.5, 5.0, 63.2], jnp.float32)
    y = jnp.asarray([5.0, 5.0, 5.0, 127.0, 31.7], jnp.float32)
    got = bilerp_pallas.bilerp_points_t(fmap, x, y, interpret=True)
    want = _oracle(fmap, x, y)
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert abs(float(got[0, 0])) < 1e-6
