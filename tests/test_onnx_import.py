"""ONNX weight extraction against the one artifact the reference ships
(output/plnet_s1.onnx — the LOI verification head)."""

import os

import numpy as np
import pytest

from airslam_tpu.models.onnx_import import load_onnx

PLNET_S1 = "/root/reference/output/plnet_s1.onnx"


@pytest.mark.skipif(not os.path.exists(PLNET_S1), reason="reference onnx absent")
def test_load_plnet_s1_weights():
    weights, ops = load_onnx(PLNET_S1)
    # the LOI verification MLP: 496-d pooled line features → 128 → 128 → 128
    # with a 240-d residual branch and a 2-way softmax head
    assert weights["fc2.0.weight"].shape == (128, 496)
    assert weights["fc2.2.weight"].shape == (128, 128)
    assert weights["fc2.4.weight"].shape == (128, 128)
    assert weights["fc2_res.0.weight"].shape == (128, 240)
    assert weights["fc2_head.weight"].shape == (2, 128)
    for v in weights.values():
        assert np.isfinite(v).all()
    # graph structure sanity: it is an MLP with gather-based line sampling
    assert ops.get("Gemm", 0) == 5
    assert ops.get("Softmax", 0) == 1
    assert ops.get("GatherElements", 0) >= 1


def test_parser_roundtrip_synthetic(tmp_path):
    """Hand-build a tiny ONNX ModelProto and parse it back."""
    import struct

    def varint(x):
        out = b""
        while True:
            b7 = x & 0x7F
            x >>= 7
            if x:
                out += bytes([b7 | 0x80])
            else:
                out += bytes([b7])
                return out

    def field(num, wt, payload):
        key = varint((num << 3) | wt)
        if wt == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    tensor = (
        field(1, 0, varint(2)) + field(1, 0, varint(3))  # dims
        + field(2, 0, varint(1))  # float32
        + field(8, 2, b"w0")
        + field(9, 2, arr.tobytes())
    )
    node = field(4, 2, b"MatMul")
    graph = field(5, 2, tensor) + field(1, 2, node)
    model = field(7, 2, graph)
    p = tmp_path / "tiny.onnx"
    p.write_bytes(model)

    weights, ops = load_onnx(str(p))
    assert np.array_equal(weights["w0"], arr)
    assert ops == {"MatMul": 1}
