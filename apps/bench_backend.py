#!/usr/bin/env python
"""Backend benchmark: the full local-BA window (robust 5 iters -> chi2 gate ->
15 iters) as one jitted program on the current device, with the differenced
in-graph-scan methodology (see bench.py). Also validates f32 convergence vs
ground truth."""
import os, sys
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo); sys.path.insert(0, os.path.join(_repo, "tests"))
import time, numpy as np, jax, jax.numpy as jnp
from airslam_tpu.utils import jaxcache; jaxcache.enable()
from airslam_tpu.backend import gn, windows
from synthetic import make_point_scene, build_problem, default_intrinsics

# synthetic local-BA window: F=15 (5 free + padding), P=256, stereo obs
rng = np.random.RandomState(0)
scene = make_point_scene(f=5, p=230, rng=rng)
from scipy.spatial.transform import Rotation
Rwb0 = scene["Rwb"].copy(); twb0 = scene["twb"].copy()
for i in range(1,5):
    Rwb0[i] = Rwb0[i] @ Rotation.from_rotvec(rng.randn(3)*0.02).as_matrix()
    twb0[i] = twb0[i] + rng.randn(3)*0.05
pts0 = scene["points"] + rng.randn(*scene["points"].shape)*0.05
prob64 = build_problem(scene, Rwb=Rwb0, twb=twb0, points=pts0)

def to_f32(x):
    if hasattr(x, 'dtype') and x.dtype == jnp.float64:
        return x.astype(jnp.float32)
    return x
prob32 = jax.tree_util.tree_map(to_f32, prob64)
intr64 = scene["intr"]
from airslam_tpu.core.camera import Intrinsics
intr32 = Intrinsics(fx=intr64.fx.astype(jnp.float32), fy=intr64.fy.astype(jnp.float32),
                    cx=intr64.cx.astype(jnp.float32), cy=intr64.cy.astype(jnp.float32),
                    bf=intr64.bf.astype(jnp.float32), width=752, height=480)

# accuracy: f32 TPU local BA vs f64 ground truth
out32, p_in, _ = windows.local_ba(prob32, intr32)
err_t = np.abs(np.asarray(out32.frames.twb) - scene["twb"]).max()
print(f"f32 local BA on {jax.default_backend()}: pose err vs GT = {err_t:.2e} m, inliers {int(np.asarray(p_in).sum())}/{int(np.asarray(prob32.point_obs_mask).sum())}")

# timing: in-graph scan, differenced
def make_run(T, early_exit=0.0):
    @jax.jit
    def run(prob, seed):
        def body(c, _):
            p2 = prob._replace(point_obs=prob.point_obs + c*1e-12)
            out, pi, li = windows.local_ba(p2, intr32, early_exit=early_exit)
            return (jnp.sum(out.frames.twb)*1e-9).astype(jnp.float32), None
        c, _ = jax.lax.scan(body, seed, None, length=T)
        return c
    return run

def timed(early_exit=0.0):
    res = {}
    for T in (2, 16):
        run = make_run(T, early_exit)
        c = run(prob32, jnp.asarray(0.0, jnp.float32)); _ = float(np.asarray(c))
        ts = []
        for r in range(3):
            t0=time.perf_counter()
            c = run(prob32, jnp.asarray(1e-6*(r+1), jnp.float32)); _ = float(np.asarray(c))
            ts.append(time.perf_counter()-t0)
        res[T] = min(ts)
    return (res[16]-res[2])/14

dt = timed()
print(f"local BA window (F=15 pad, P=256, 5+15 LM iters): {dt*1e3:.2f} ms")

# opt-in early-exit LM (optimization.early_exit): equal accuracy, fewer iters
out_ee, _, _ = windows.local_ba(prob32, intr32, early_exit=1e-6)
err_ee = np.abs(np.asarray(out_ee.frames.twb) - scene["twb"]).max()
dt_ee = timed(early_exit=1e-6)
print(f"local BA early_exit=1e-6: {dt_ee*1e3:.2f} ms ({dt/max(dt_ee,1e-12):.2f}x), "
      f"pose err {err_ee:.2e} m (full schedule: {err_t:.2e})")
