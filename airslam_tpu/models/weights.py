"""Model parameter persistence and (future) ONNX import.

The reference ships ONNX graphs compiled to TensorRT engines; the engine cache
(``save_engine``/``deserialize_engine``, plnet.cpp:587-644) maps here to (a)
flax param archives and (b) the persistent XLA compile cache
(``airslam_tpu.utils.jaxcache``). Trained weights for PLNet/SuperPoint/
LightGlue can be imported by converting the upstream checkpoints into the
``save_params`` layout; ``airslam_tpu.parallel.training`` fine-tunes on-TPU.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
from flax import traverse_util


def save_params(path: str, params: Dict[str, Any]):
    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params(path: str) -> Dict[str, Any]:
    z = np.load(path)
    flat = {k: z[k] for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")


def import_plnet_s1(onnx_path: str) -> Dict[str, Any]:
    """Map the reference's shipped ``plnet_s1.onnx`` initializers onto the
    :class:`airslam_tpu.models.plnet.LoiHeadS1` flax parameter tree
    (bit-exact; see tests/test_loi_s1.py). PyTorch Linear stores (out, in);
    flax Dense kernels are (in, out)."""
    from airslam_tpu.models.onnx_import import load_onnx

    w, _ = load_onnx(onnx_path)

    def lin(prefix):
        return {
            "kernel": np.ascontiguousarray(w[f"{prefix}.weight"].T),
            "bias": np.ascontiguousarray(w[f"{prefix}.bias"]),
        }

    return {
        "params": {
            "fc2_0": lin("fc2.0"),
            "fc2_2": lin("fc2.2"),
            "fc2_4": lin("fc2.4"),
            "fc2_res": lin("fc2_res.0"),
            "fc2_head": lin("fc2_head"),
            # exact sampling-ramp constants (LSBs differ from arange/31)
            "t_fwd": np.ascontiguousarray(w["onnx::Mul_1141"].reshape(-1)),
            "t_rev": np.ascontiguousarray(w["onnx::Mul_1142"].reshape(-1)),
        }
    }


_CHECKPOINT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "checkpoints")


def checkpoint_path(name: str) -> str:
    # AIRSLAM_CHECKPOINT_DIR overrides the shipped checkpoint directory
    # (A/B experiments with alternate weight sets; falls back per-file)
    override = os.environ.get("AIRSLAM_CHECKPOINT_DIR")
    if override:
        p = os.path.join(override, name)
        if os.path.exists(p):
            return p
    return os.path.normpath(os.path.join(_CHECKPOINT_DIR, name))


def load_default_frontend(use_superpoint: bool = False, matcher: int = 0):
    """(detector_params, matcher_params) from the shipped trained checkpoints
    (synthetic-shapes training, apps/train_plnet.py / train_matcher.py), or
    None where absent. The stage-1 LOI head inside plnet_s0.npz starts from
    the reference's imported plnet_s1.onnx weights."""
    det = None
    p0 = checkpoint_path("plnet_s0.npz")
    if os.path.exists(p0):
        z = load_params(p0)
        det = {"plnet": z["plnet"], "loi": z["loi"]}
        sp = checkpoint_path("superpoint.npz")
        if use_superpoint and os.path.exists(sp):
            det["superpoint"] = load_params(sp)
        elif use_superpoint:
            det = None  # incomplete set — caller falls back to random init
    mat = None
    mp = checkpoint_path("lightglue.npz" if matcher == 0 else "superglue.npz")
    if os.path.exists(mp):
        mat = load_params(mp)
    return det, mat


def load_or_init(path: str, init_fn):
    """Load params from ``path`` if present, else initialize (and persist)."""
    if path and os.path.exists(path):
        return load_params(path)
    params = init_fn()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_params(path, params)
    return params
