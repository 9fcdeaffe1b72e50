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


def load_or_init(path: str, init_fn):
    """Load params from ``path`` if present, else initialize (and persist)."""
    if path and os.path.exists(path):
        return load_params(path)
    params = init_fn()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_params(path, params)
    return params
