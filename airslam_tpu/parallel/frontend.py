"""Frame-parallel frontend: shard a batch of frames over the device mesh.

The reference's offline stages (map refinement re-detection, batch mapping
over recorded sequences — SURVEY §3.2) are embarrassingly parallel over
frames; on a multi-chip host the fused detector runs SPMD with the batch
dimension sharded over every mesh device. XLA partitions the convolutions /
decode automatically from the input sharding — no collectives are needed
until the results are gathered.

Usage::

    mesh = parallel.mesh.make_mesh()
    feats = sharded_detect(detector, frames, mesh)   # (B, H, W) -> features

``B`` must be a multiple of the mesh size (pad with zero frames and drop the
padded outputs otherwise — :func:`pad_batch` does this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_all_devices(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over EVERY mesh device (dp × tp) — pure data parallelism
    for per-frame work."""
    return NamedSharding(mesh, P(("dp", "tp")))


def pad_batch(images: np.ndarray, mesh: Mesh):
    """Pad (B, H, W) to a multiple of the mesh size; returns (padded, B)."""
    n = mesh.devices.size
    b = images.shape[0]
    pad = (-b) % n
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)], axis=0
        )
    return images, b


def sharded_detect(detector, images, mesh: Mesh, detect_junctions: bool = False):
    """Run ``detector.detect`` with the frame batch sharded over the mesh.

    Returns the same batched ``FrameFeatures`` as the single-device path
    (padding frames removed). The detector's jitted program is compiled once
    per (batch-per-device) shape; XLA propagates the batch sharding through
    the whole fused graph.
    """
    arr, b = pad_batch(np.asarray(images, np.float32), mesh)
    x = jax.device_put(jnp.asarray(arr), batch_all_devices(mesh))
    with mesh:
        feats = detector.detect(x, detect_junctions=detect_junctions)
    return jax.tree_util.tree_map(lambda t: t[:b], feats)
