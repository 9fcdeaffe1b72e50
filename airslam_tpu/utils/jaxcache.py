"""Persistent XLA compilation cache.

The reference builds TensorRT engines once and serializes them
(``save_engine``/``deserialize_engine``, plnet.cpp:587-644). The JAX
equivalent is the persistent compilation cache: first run compiles (~tens of
seconds for the fused frontend), subsequent processes deserialize.

``read_only=True`` keeps cache *reads* but never serializes new executables
(debugging knob, also via ``AIRSLAM_CACHE_READONLY=1``). See
:func:`bound_jit_code_maps` for the ``vm.max_map_count`` guard that long
many-program processes (the test suite) need.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def bound_jit_code_maps(threshold: int = 0) -> bool:
    """Guard against ``vm.max_map_count`` exhaustion (default limit 65530).

    Every XLA:CPU executable JIT-loads its kernels as anonymous r-xp/r--p/rw-p
    mappings that stay mapped while the executable is cached. A long-lived
    process compiling hundreds of programs (the test suite) accumulates tens
    of thousands of mappings; once the process hits the kernel limit, the next
    mmap fails and XLA segfaults — in compile, serialize or deserialize,
    whichever runs next. ``jax.clear_caches()`` drops the executables and
    returns the mappings. Call this between units of work; returns True if a
    clear happened. ``threshold`` defaults to 60% of the live
    ``vm.max_map_count``.
    """
    try:
        if threshold <= 0:
            with open("/proc/sys/vm/max_map_count") as f:
                threshold = int(int(f.read()) * 0.6)
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except (OSError, ValueError):  # non-Linux
        return False
    if n <= threshold:
        return False
    jax.clear_caches()
    return True


def enable(path: str = _DEFAULT, read_only: bool = False):
    if os.environ.get("AIRSLAM_CACHE_READONLY") == "1":
        read_only = True
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        1e18 if read_only else 1.0,
    )
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
