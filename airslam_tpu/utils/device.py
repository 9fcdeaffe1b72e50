"""Device/platform selection for the CLI apps.

The deployment container may pin JAX to a remote TPU plugin; ``--device cpu``
forces local CPU through jax.config (which wins over the env var)."""

import os

import jax


def select(device: str | None):
    if device and device != "auto":
        if device == "tpu" and "axon" in os.environ.get("JAX_PLATFORMS", ""):
            # the remote-TPU PJRT tunnel registers under its own platform
            # name ("axon"); requesting the local "tpu" plugin there fails
            # with "No jellyfish device found"
            device = "axon"
        jax.config.update("jax_platforms", device)


def add_arg(parser):
    parser.add_argument("--device", default="auto", choices=["auto", "cpu", "tpu"],
                        help="execution platform (default: environment's)")
