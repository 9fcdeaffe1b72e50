"""Tiny numpy executor for the ONNX op subset used by the reference's
shipped checkpoints (``plnet_s1.onnx``).

Purpose: run the reference graph *as data* — an oracle for bit-exact weight
import into the JAX modules (see models/plnet.py::LoiHeadS1) without needing
the ``onnx``/``onnxruntime`` packages. Op semantics follow the ONNX spec for
the opset the file was exported with (13); only the behaviors those graphs
exercise are implemented.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from airslam_tpu.models.onnx_import import load_onnx_graph

_CAST = {1: np.float32, 6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16,
         11: np.float64}


def _slice(data, starts, ends, axes=None, steps=None):
    starts = np.asarray(starts).ravel()
    ends = np.asarray(ends).ravel()
    axes = (np.asarray(axes).ravel() if axes is not None
            else np.arange(len(starts)))
    steps = (np.asarray(steps).ravel() if steps is not None
             else np.ones(len(starts), np.int64))
    sl = [slice(None)] * data.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = int(a) % data.ndim
        s, e, st = int(s), int(e), int(st)
        # ONNX clamps INT_MAX/MIN-ish sentinels
        dim = data.shape[a]
        if s > dim:
            s = dim
        if e > dim:
            e = dim
        if s < -dim:
            s = -dim
        if e < -(dim + 1):
            e = None if st < 0 else -dim
        sl[a] = slice(s, e, st)
    return data[tuple(sl)]


def _gather_elements(data, indices, axis):
    idx = indices.astype(np.int64)
    idx = np.where(idx < 0, idx + data.shape[axis], idx)
    return np.take_along_axis(data, idx, axis=axis)


def _scatter_elements(data, indices, updates, axis):
    out = data.copy()
    idx = indices.astype(np.int64)
    idx = np.where(idx < 0, idx + data.shape[axis], idx)
    np.put_along_axis(out, idx, updates, axis=axis)
    return out


def run_graph(path: str, feeds: Dict[str, np.ndarray],
              trace: bool = False) -> Dict[str, np.ndarray]:
    """Execute the graph at ``path`` with the given input feeds; returns the
    graph outputs (and, with ``trace``, every intermediate tensor)."""
    nodes, inits, g_in, g_out = load_onnx_graph(path)
    env: Dict[str, np.ndarray] = dict(inits)
    for k, v in feeds.items():
        env[k] = np.asarray(v)

    for n in nodes:
        op = n["op"]
        ins = [env[i] if i else None for i in n["inputs"]]
        a = n["attrs"]
        if op == "Constant":
            out = a["value"]
        elif op == "Cast":
            out = ins[0].astype(_CAST[int(a["to"])])
        elif op == "Shape":
            out = np.asarray(ins[0].shape, np.int64)
        elif op == "Reshape":
            shape = [int(s) for s in np.asarray(ins[1]).ravel()]
            out = ins[0].reshape(shape)
        elif op == "Gather":
            out = np.take(ins[0], ins[1].astype(np.int64), axis=int(a.get("axis", 0)))
        elif op == "GatherElements":
            out = _gather_elements(ins[0], ins[1], int(a.get("axis", 0)))
        elif op == "ScatterElements":
            out = _scatter_elements(ins[0], ins[1], ins[2], int(a.get("axis", 0)))
        elif op == "Range":
            out = np.arange(int(ins[0]), int(ins[1]), int(ins[2]), dtype=np.int64)
        elif op == "Slice":
            out = _slice(ins[0], ins[1], ins[2],
                         ins[3] if len(ins) > 3 else None,
                         ins[4] if len(ins) > 4 else None)
        elif op == "ConstantOfShape":
            val = a.get("value")
            fill = val.ravel()[0] if val is not None and val.size else np.float32(0)
            out = np.full([int(s) for s in ins[0]], fill, dtype=np.asarray(fill).dtype)
        elif op == "Unsqueeze":
            axes = [int(x) for x in np.asarray(ins[1]).ravel()]
            out = ins[0]
            for ax in sorted(axes):
                out = np.expand_dims(out, ax)
        elif op == "Concat":
            out = np.concatenate(ins, axis=int(a["axis"]))
        elif op == "Sub":
            out = ins[0] - ins[1]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "Floor":
            out = np.floor(ins[0])
        elif op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
            out = np.clip(ins[0], lo, hi)
        elif op == "Relu":
            out = np.maximum(ins[0], 0)
        elif op == "Transpose":
            out = np.transpose(ins[0], a.get("perm"))
        elif op == "Flatten":
            ax = int(a.get("axis", 1))
            lead = int(np.prod(ins[0].shape[:ax])) if ax else 1
            out = ins[0].reshape(lead, -1)
        elif op == "Gemm":
            alpha = float(a.get("alpha", 1.0))
            beta = float(a.get("beta", 1.0))
            A = ins[0].T if int(a.get("transA", 0)) else ins[0]
            B = ins[1].T if int(a.get("transB", 0)) else ins[1]
            out = alpha * (A @ B)
            if len(ins) > 2 and ins[2] is not None:
                out = out + beta * ins[2]
        elif op == "Softmax":
            ax = int(a.get("axis", -1))
            e = np.exp(ins[0] - ins[0].max(axis=ax, keepdims=True))
            out = e / e.sum(axis=ax, keepdims=True)
        elif op == "MatMul":
            out = ins[0] @ ins[1]
        elif op == "Max":
            out = ins[0]
            for x in ins[1:]:
                out = np.maximum(out, x)
        elif op == "ReduceMax":
            axes = a.get("axes")
            out = ins[0].max(axis=tuple(int(x) for x in axes) if axes else None,
                             keepdims=bool(a.get("keepdims", 1)))
        elif op == "MaxPool":
            # 1-D pooling over the last axis (kernel k, stride s), NCW layout
            k = int(a["kernel_shape"][0])
            s = int(a.get("strides", [k])[0])
            x = ins[0]
            n_out = (x.shape[-1] - k) // s + 1
            out = np.stack([x[..., i * s: i * s + k].max(-1) for i in range(n_out)], -1)
        else:
            raise NotImplementedError(f"op {op} ({n['name']})")
        env[n["outputs"][0]] = np.asarray(out)

    if trace:
        return env
    return {k: env[k] for k in g_out}
