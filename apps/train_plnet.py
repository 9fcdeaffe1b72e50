"""Train PLNet stage-0 (+ LOI head) and/or SuperPoint on synthetic shapes,
on-device (TPU or CPU), saving flax checkpoints the FeatureDetector loads.

The per-step batch shards over the mesh's dp axis when more than one device
is visible (data generation included — each device renders its own scenes).

Usage:
  python apps/train_plnet.py --steps 2000 --batch 8 --out airslam_tpu/checkpoints
  python apps/train_plnet.py --model superpoint --steps 2000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["plnet", "superpoint"], default="plnet")
    ap.add_argument("--distill", action="store_true",
                    help="superpoint only: distill descriptors onto the "
                         "trained PLNet stage-0 space (shared space across "
                         "use_superpoint: 0/1 configs)")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="start from the existing checkpoint if present")
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--augment", type=float, default=1.0,
                    help="photometric augmentation strength (0 disables)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from airslam_tpu.utils import jaxcache

    jaxcache.enable()

    from airslam_tpu.frontend.detector import DETECT_SIZE
    from airslam_tpu.models import weights as wio
    from airslam_tpu.models.plnet import LoiHeadS1, PLNet
    from airslam_tpu.models.superpoint import SuperPoint
    from airslam_tpu.parallel import train_plnet as tp

    out_dir = args.out or os.path.dirname(wio.checkpoint_path("x"))
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(args.lr))

    dummy = jnp.zeros((1, DETECT_SIZE, DETECT_SIZE, 1), jnp.float32)
    if args.model == "plnet":
        plnet = PLNet()
        loi = LoiHeadS1()
        ckpt = os.path.join(out_dir, "plnet_s0.npz")
        if args.resume and os.path.exists(ckpt):
            params = wio.load_params(ckpt)
        else:
            k0, _ = jax.random.split(key)
            loi_init = wio.load_params(wio.checkpoint_path("plnet_s1.npz"))
            params = {"plnet": plnet.init(k0, dummy), "loi": loi_init}
        step_fn = jax.jit(tp.make_plnet_train_step(plnet, loi, tx,
                                                   augment=args.augment))
    else:
        sp = SuperPoint()
        ckpt = os.path.join(out_dir, "superpoint.npz")
        if args.resume and os.path.exists(ckpt):
            params = wio.load_params(ckpt)
        else:
            params = sp.init(jax.random.PRNGKey(args.seed), dummy)
        if args.distill:
            s0 = wio.checkpoint_path("plnet_s0.npz")
            if not os.path.exists(s0):
                sys.exit("distillation needs the trained plnet_s0.npz")
            plnet = PLNet()
            step_fn = jax.jit(tp.make_superpoint_distill_step(
                sp, tx, plnet.apply, wio.load_params(s0)["plnet"],
                augment=args.augment))
        else:
            step_fn = jax.jit(tp.make_superpoint_train_step(
                sp, tx, augment=args.augment))

    opt_state = tx.init(params)

    ndev = len(jax.devices())
    if ndev > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
        key_sharding = NamedSharding(mesh, P("dp"))
    else:
        key_sharding = None

    t0 = time.time()
    for step in range(args.steps):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, args.batch)
        if key_sharding is not None:
            keys = jax.device_put(keys, key_sharding)
        params, opt_state, loss, terms = step_fn(params, opt_state, keys)
        if step % args.log_every == 0 or step == args.steps - 1:
            terms = {k: float(v) for k, v in terms.items()}
            print(
                f"step {step:5d} loss {float(loss):8.4f} "
                + " ".join(f"{k}={v:.4f}" for k, v in sorted(terms.items()))
                + f"  ({(time.time() - t0):.0f}s)",
                flush=True,
            )
        if step and step % 500 == 0:
            wio.save_params(ckpt, jax.device_get(params))
    wio.save_params(ckpt, jax.device_get(params))
    print(f"saved {ckpt}")


if __name__ == "__main__":
    main()
