"""Per-stage on-chip timing of the local-BA window (the full-system rate's
second component after the frame path — FULLSYS_TPU.json).

Times, each with the bench.py scan-slope methodology (short/long scan
differenced slope, DCE-proof carry, interleaved min-of-reps):

  local_ba        the production program (5+15 LM iters + chi² gating)
  assemble_solve  one damped assemble+solve (the per-iteration body)
  residuals       point+line residual/jacobian grids only
  schur           given fixed grids: Schur reduce + 227×227 solve + backsub
  cost            total_cost (the accept/reject evaluation per LM step)

Shapes are the e2e padded buckets (F=15, P=256, L=32) — identical to
scripts/bench_full_path.py::build_local_ba_window.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(fn, t_lo=8, t_hi=64, reps=5):
    """Differenced scan-slope seconds/step of ``fn(carry, step_seed)``."""

    @functools.partial(jax.jit, static_argnames=("T",))
    def run(seed, T):
        def body(c, x):
            return fn(c, x), None

        c, _ = jax.lax.scan(body, seed, jnp.arange(T, dtype=jnp.float32))
        return c

    times = {t_lo: [], t_hi: []}
    for T in (t_lo, t_hi):
        _ = float(np.asarray(run(jnp.asarray(0.0, jnp.float32), T)))
    for rep in range(reps):
        for T in (t_lo, t_hi):
            seed = jnp.asarray(1e-6 * (rep + 1), jnp.float32)
            t0 = time.perf_counter()
            _ = float(np.asarray(run(seed, T)))
            times[T].append(time.perf_counter() - t0)
    return (min(times[t_hi]) - min(times[t_lo])) / (t_hi - t_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    from scripts.bench_full_path import build_local_ba_window
    from airslam_tpu.backend import gn, windows

    prob, intr = build_local_ba_window()
    cfg = gn.BAConfig()
    lam = jnp.asarray(1e-3, jnp.float32)

    def consume(tree):
        return sum(jnp.sum(x.astype(jnp.float32)) * 1e-9
                   for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number))

    results = {}

    def t_local_ba(c, x):
        p2 = prob._replace(point_obs=prob.point_obs + x * 1e-12 + c * 1e-12)
        out = windows.local_ba(p2, intr)
        return (consume(out)).astype(jnp.float32)

    def t_assemble(c, x):
        p2 = prob._replace(point_obs=prob.point_obs + x * 1e-12 + c * 1e-12)
        out = gn._assemble_and_solve(p2, intr, cfg, lam, robust=True)
        return (consume(out)).astype(jnp.float32)

    def t_residuals(c, x):
        p2 = prob._replace(point_obs=prob.point_obs + x * 1e-12 + c * 1e-12)
        r, m, d, Jc, Jp = gn._point_grid_residuals(p2, intr, True)
        lr, lm_, LJc, LJl = gn._line_grid_residuals(p2, intr, True)
        return (consume((r, Jc, Jp, lr, LJc, LJl))).astype(jnp.float32)

    def t_cost(c, x):
        p2 = prob._replace(point_obs=prob.point_obs + x * 1e-12 + c * 1e-12)
        return (gn.total_cost(p2, intr, cfg, robust=True) * 1e-9
                + c * 0).astype(jnp.float32)

    for name, fn in (("local_ba", t_local_ba), ("assemble_solve", t_assemble),
                     ("residuals", t_residuals), ("cost", t_cost)):
        dt = slope(fn, reps=args.reps)
        results[name] = round(dt * 1e3, 4)
        print(f"{name}: {dt * 1e3:.3f} ms")

    # solve_spd alone at the window's reduced dimension
    D = prob.frames.Rwb.shape[0] * gn.FRAME_DIM + gn.GRAV_DIM
    rng = np.random.RandomState(0)
    A = rng.randn(D, 2 * D).astype(np.float32)
    H0 = jnp.asarray(A @ A.T + D * np.eye(D, dtype=np.float32))
    b0 = jnp.asarray(rng.randn(D).astype(np.float32))

    def t_solve(c, x):
        dx = gn.solve_spd(H0 + jnp.eye(D) * (x * 1e-9 + c * 1e-9), b0)
        return (jnp.sum(dx) * 1e-9).astype(jnp.float32)

    dt = slope(t_solve, t_lo=16, t_hi=256, reps=args.reps)
    results[f"solve_spd_{D}"] = round(dt * 1e3, 4)
    print(f"solve_spd_{D}: {dt * 1e3:.3f} ms")

    print(json.dumps({"metric": "local_ba_stage_ms", "stages": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
