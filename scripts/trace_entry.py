"""On-device timing of the fused frontend via a jax.profiler trace.

The remote-TPU tunnel makes host-side timing noisy (CLAUDE.md); the profiler
records TRUE device occupancy per HLO op. This runs the exact bench.py scan
(16 frames, full carry), parses the xplane trace JSON, and prints:
- total device ms/frame (the number the tunnel can only add noise to),
- per-category and top-op breakdowns (what to optimize next).

Usage: python scripts/trace_entry.py [--top N] [--frames T]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_traced_scan(frames_n: int, trace_dir: str):
    import jax
    import jax.numpy as jnp

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()
    from __graft_entry__ import entry

    fn, args = entry()
    plp, loip, lgp, _ = args

    @jax.jit
    def run_frames(plp, loip, lgp, frames, seed):
        def body(c, pair):
            out = fn(plp, loip, lgp, pair + c * 1e-3)
            c2 = sum(jnp.sum(o.astype(jnp.float32))
                     for o in jax.tree_util.tree_leaves(out))
            return (c2 * 1e-9 + seed).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, seed, frames)
        return c

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(frames_n, 2, 480, 752).astype(np.float32))
    c = run_frames(plp, loip, lgp, frames, jnp.asarray(0.0, jnp.float32))
    float(np.asarray(c))  # compile + warm
    jax.profiler.start_trace(trace_dir)
    c = run_frames(plp, loip, lgp, frames, jnp.asarray(0.1, jnp.float32))
    float(np.asarray(c))
    jax.profiler.stop_trace()


def parse_trace(trace_dir: str, frames_n: int, top: int):
    path = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(lambda: [0.0, "?", ""])
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or pids.get(e["pid"]) != "/device:TPU:0":
            continue
        if e["name"].startswith(("jit_", "while")):
            continue
        a = e.get("args", {})
        agg[e["name"]][0] += e.get("dur", 0)
        agg[e["name"]][1] = a.get("hlo_category", "?")
        agg[e["name"]][2] = a.get("source", "")
        total += e.get("dur", 0)
    per_frame = total / frames_n
    print(f"DEVICE total: {per_frame / 1e3:.3f} ms/frame "
          f"({1e6 / per_frame:.1f} Hz) over {frames_n} frames")
    bycat = collections.Counter()
    for name, (dur, cat, src) in agg.items():
        bycat[cat] += dur / frames_n
    for cat, dur in bycat.most_common(12):
        print(f"  {cat:25s} {dur / 1e3:8.3f} ms")
    print(f"\n{'us/frame':>8s} {'category':22s} {'source':42s} op")
    for name, (dur, cat, src) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"{dur / frames_n:8.1f} {cat:22s} {src[-42:]:42s} {name[:40]}")
    return per_frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--keep", default=None, help="keep the trace dir here")
    args = ap.parse_args()
    trace_dir = args.keep or tempfile.mkdtemp(prefix="airslam_trace_")
    try:
        run_traced_scan(args.frames, trace_dir)
        parse_trace(trace_dir, args.frames, args.top)
    finally:
        if not args.keep:
            shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
