"""Mesh-pipelined map building: frame-parallel detection ∥ host tracking.

The reference overlaps its feature thread with its tracking thread on one
GPU (map_builder.cc:33-49, bounded queues). On a multi-chip TPU host the
same overlap generalizes: the mesh detects a CHUNK of upcoming frames
frame-parallel (one stereo image per chip via
:func:`airslam_tpu.parallel.frontend.sharded_detect`) while the host
consumes the previous chunk sequentially — tracking, the keyframe policy
and map maintenance are inherently serial, but CNN detection dominates the
per-frame device cost, so every chip stays busy.

JAX dispatch is asynchronous, so no threads are needed: the chunk-t+1
detection program is enqueued before chunk t's features are pulled to the
host. Results are IDENTICAL to the sequential loop — detection is
stateless per frame and consumption order is preserved
(tests/test_parallel.py::test_mesh_pipelined_runner_matches_sequential).
"""

from __future__ import annotations

import numpy as np

from .frontend import sharded_detect


class MeshPipelinedRunner:
    """Double-buffered chunked runner over a ``jax.sharding.Mesh``.

    ``frames_per_chunk`` defaults to ``mesh.size // 2`` (each frame is a
    stereo pair = 2 images, so a chunk fills every chip with one image).
    With a 1-device mesh this degrades gracefully to the single-chip
    double-buffered pipeline (chunk size 1).
    """

    def __init__(self, builder, mesh, frames_per_chunk: int | None = None):
        self.builder = builder
        self.mesh = mesh
        self.chunk = max(1, int(frames_per_chunk or mesh.devices.size // 2))

    def run(self, dataset, max_frames: int = 0, progress=None):
        b = self.builder
        n = len(dataset) if max_frames <= 0 else min(len(dataset), max_frames)
        pending = None
        done = 0
        for lo in range(0, n, self.chunk):
            hi = min(lo + self.chunk, n)
            metas, images = [], []
            for i in range(lo, hi):
                ts, left_raw, right_raw, imu = dataset.get(i)
                left, right = b.rectify(left_raw, right_raw)
                metas.append((ts, imu))
                images.append(left)
                images.append(right)
            feats_dev = sharded_detect(
                b.detector, np.stack(images), self.mesh, detect_junctions=True
            )  # async: enqueued before the previous chunk is consumed
            if pending is not None:
                done += self._consume(pending, progress, done)
            pending = (metas, feats_dev)
        if pending is not None:
            done += self._consume(pending, progress, done)
        return n

    def _consume(self, item, progress, done):
        import jax.tree_util as jtu

        metas, feats_dev = item
        b = self.builder
        feats = jtu.tree_map(np.asarray, feats_dev)  # one host pull per chunk
        for j, (ts, imu) in enumerate(metas):
            f0 = jtu.tree_map(lambda t: t[2 * j], feats)
            f1 = jtu.tree_map(lambda t: t[2 * j + 1], feats)
            pairs, temporal = b._stereo_and_temporal(f0, f1)
            b.track_features(ts, f0, f1, pairs, imu, temporal_matches=temporal)
            if progress is not None:
                progress(done + j)
        return len(metas)
