"""Device mesh and sharding utilities.

The reference is single-process/single-GPU (SURVEY §2.6); multi-chip scaling
here is additive capability: data-parallel frame batches, tensor-parallel
attention in the matcher, and sharded global-BA / vocabulary-scoring matmuls
ride the ICI via `jax.sharding` — XLA inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    """2-D (dp, tp) mesh over the first ``n_devices`` devices. ``tp`` defaults
    to 2 when the device count is even and > 1, else 1."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tp is None:
        tp = 2 if (n % 2 == 0 and n > 1) else 1
    dp = n // tp
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp."""
    return NamedSharding(mesh, P("dp"))


def shard_lightglue_params(params, mesh: Mesh):
    """Tensor-parallel layout for the matcher: attention QKV/out projections
    shard their feature dim over ``tp``; everything else is replicated. XLA
    turns the resulting partial sums into psums over ICI."""

    def spec_for(path, x):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if x.ndim == 2 and x.shape[-1] % mesh.shape["tp"] == 0:
            if any(k in name for k in ("qkv", "to_qk", "to_v", "q/", "k/", "v/")):
                return NamedSharding(mesh, P(None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, spec_for(path, x)), params
    )
