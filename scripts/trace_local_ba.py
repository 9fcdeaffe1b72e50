"""Per-HLO-op device timing of the local-BA window via a jax.profiler trace.

Same methodology as scripts/trace_entry.py (which attributes the frontend):
run the production local_ba program (F=15, P=256, L=32, 5+15 LM iters) in a
T-step scan on the TPU, record the xplane trace, and print the per-category
and top-op breakdown — the 4.5 ms window is ~0.22 ms/LM-iteration of mostly
tiny ops, and this names them.

Usage: python scripts/trace_local_ba.py [--top N] [--steps T] [--vi]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.trace_entry import parse_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--vi", action="store_true",
                    help="trace the stereo-inertial window (IMU chain over "
                    "the free frames) instead of the vision-only one")
    ap.add_argument("--keep", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()
    from scripts.bench_full_path import build_local_ba_window
    from airslam_tpu.backend import windows

    prob, intr = build_local_ba_window(vi=args.vi) \
        if "vi" in build_local_ba_window.__code__.co_varnames \
        else build_local_ba_window()

    @jax.jit
    def run(seed, xs):
        def body(c, x):
            p2 = prob._replace(point_obs=prob.point_obs + (x + c) * 1e-12)
            out, p_in, l_in = windows.local_ba(p2, intr)
            c2 = (jnp.sum(out.frames.twb) * 1e-9 + jnp.sum(p_in) * 1e-12
                  + jnp.sum(l_in) * 1e-12)
            return (c2 + seed).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, seed, xs)
        return c

    xs = jnp.arange(args.steps, dtype=jnp.float32)
    c = run(jnp.asarray(0.0, jnp.float32), xs)
    _ = float(np.asarray(c))  # warm

    trace_dir = args.keep or tempfile.mkdtemp(prefix="airslam_ba_trace_")
    try:
        jax.profiler.start_trace(trace_dir)
        c = run(jnp.asarray(1e-6, jnp.float32), xs)
        _ = float(np.asarray(c))
        jax.profiler.stop_trace()
        parse_trace(trace_dir, args.steps, args.top)
    finally:
        if not args.keep:
            shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
