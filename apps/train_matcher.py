"""Train LightGlue or SuperGlue on rendered affine scene pairs described by
the (frozen) trained PLNet — saves airslam_tpu/checkpoints/{lightglue,
superglue}.npz, which PointMatcher-based apps load via the default checkpoint
path.

Usage: python apps/train_matcher.py --steps 1500 --batch 4 [--arch superglue]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=["lightglue", "superglue"], default="lightglue")
    ap.add_argument("--tokens", choices=["corners", "detected"], default="corners",
                    help="corners: GT-corner tokens; detected: the frozen "
                         "detector's top-k keypoints (inference distribution)")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--augment", type=float, default=1.0,
                    help="photometric augmentation strength (0 disables)")
    ap.add_argument("--view", type=float, default=1.0,
                    help="viewpoint-gap curriculum: affine strength sampled "
                         "per pair in [1, view] (detected tokens only)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    from airslam_tpu.frontend import synthgen
    from airslam_tpu.models import weights as wio
    from airslam_tpu.models.lightglue import LightGlue
    from airslam_tpu.models.plnet import PLNet
    from airslam_tpu.parallel import training

    s0_ckpt = wio.checkpoint_path("plnet_s0.npz")
    if not os.path.exists(s0_ckpt):
        sys.exit("train the detector first (apps/train_plnet.py)")
    plnet = PLNet()
    plnet_params = wio.load_params(s0_ckpt)["plnet"]

    n = synthgen.MAX_CORNERS
    if args.arch == "lightglue":
        model = LightGlue()
        ckpt = wio.checkpoint_path("lightglue.npz")
        state, tx = training.init_train_state(model, n, lr=args.lr, seed=args.seed)
        make_step = training.make_rendered_train_step
    else:
        from airslam_tpu.models.superglue import SuperGlue

        model = SuperGlue(sinkhorn_iterations=training.SG_SINKHORN_ITERS,
                          return_full=True)
        ckpt = wio.checkpoint_path("superglue.npz")
        state, tx = training.init_train_state_sg(model, n, lr=args.lr, seed=args.seed)
        make_step = training.make_rendered_train_step_sg
    if args.resume and os.path.exists(ckpt):
        params = wio.load_params(ckpt)
        state = training.TrainState(params, tx.init(params), state.step)
    if args.tokens == "detected":
        step_fn = jax.jit(training.make_detected_train_step(
            model, tx, plnet.apply, plnet_params,
            superglue=args.arch == "superglue", augment=args.augment,
            view=args.view))
    else:
        step_fn = jax.jit(make_step(model, tx, plnet.apply, plnet_params,
                                    augment=args.augment))

    key = jax.random.PRNGKey(args.seed + 7)
    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, args.batch)
        state, loss = step_fn(state, keys)
        if step % args.log_every == 0 or step == args.steps - 1:
            print(f"step {step:5d} loss {float(loss):8.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
        if step and step % 500 == 0:
            wio.save_params(ckpt, jax.device_get(state.params))
    wio.save_params(ckpt, jax.device_get(state.params))
    print(f"saved {ckpt}")


if __name__ == "__main__":
    main()
