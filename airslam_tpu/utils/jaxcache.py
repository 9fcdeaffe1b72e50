"""Persistent XLA compilation cache.

The reference builds TensorRT engines once and serializes them
(``save_engine``/``deserialize_engine``, plnet.cpp:587-644). The JAX
equivalent is the persistent compilation cache: first run compiles (~tens of
seconds for the fused frontend), subsequent processes deserialize.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable(path: str = _DEFAULT):
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
