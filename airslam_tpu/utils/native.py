"""ctypes bindings for the native host-runtime kernels (native/slam_kernels.cpp).

Compiles the shared library on first use (g++ -O3, cached next to the
source); every entry point has a numpy fallback so the framework runs without
a toolchain. See the .cpp header for which reference components these replace.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_SRC = os.path.join(_NATIVE_DIR, "slam_kernels.cpp")
_SO = os.path.join(_NATIVE_DIR, "libslam_kernels.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
    lib.invfile_query.argtypes = [i32p, ctypes.c_int64, i64p, i32p,
                                  ctypes.c_int64, i32p, ctypes.c_int64]
    lib.union_find.argtypes = [i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64]
    lib.radius_search.argtypes = [f32p, u8p, ctypes.c_int64, ctypes.c_float,
                                  ctypes.c_float, ctypes.c_float, i32p]
    lib.radius_search.restype = ctypes.c_int64
    lib.descriptor_distances.argtypes = [f32p, f32p, ctypes.c_int64, f32p]
    _lib = lib
    return _lib


# -- public wrappers (native with numpy fallback) ---------------------------


def invfile_query(query_words: np.ndarray, csr_offsets: np.ndarray,
                  csr_frames: np.ndarray, n_frames: int) -> np.ndarray:
    """Shared-word counts per dense frame slot."""
    lib = get_lib()
    qw = np.ascontiguousarray(query_words, np.int32)
    if lib is not None:
        counts = np.zeros(n_frames, np.int32)
        lib.invfile_query(
            qw, len(qw), np.ascontiguousarray(csr_offsets, np.int64),
            np.ascontiguousarray(csr_frames, np.int32),
            len(csr_offsets) - 1, counts, n_frames,
        )
        return counts
    counts = np.zeros(n_frames, np.int32)
    n_words = len(csr_offsets) - 1
    for w in qw:
        if 0 <= w < n_words:
            fr = csr_frames[csr_offsets[w]: csr_offsets[w + 1]]
            np.add.at(counts, fr[(fr >= 0) & (fr < n_frames)], 1)
    return counts


def union_find(pairs: np.ndarray, n_ids: int) -> np.ndarray:
    """pairs: (N, 2) int64 → roots (n_ids,) with smallest-id representatives."""
    lib = get_lib()
    pairs = np.ascontiguousarray(pairs, np.int64).reshape(-1, 2)
    if lib is not None:
        roots = np.zeros(n_ids, np.int64)
        lib.union_find(
            np.ascontiguousarray(pairs[:, 0]), np.ascontiguousarray(pairs[:, 1]),
            len(pairs), roots, n_ids,
        )
        return roots
    parent = np.arange(n_ids, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a < 0 or b < 0 or a >= n_ids or b >= n_ids:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.asarray([find(i) for i in range(n_ids)], np.int64)


def radius_search(kpts_xy: np.ndarray, mask: np.ndarray, x: float, y: float,
                  radius: float) -> np.ndarray:
    lib = get_lib()
    kx = np.ascontiguousarray(kpts_xy, np.float32)
    mk = np.ascontiguousarray(mask, np.uint8)
    if lib is not None:
        out = np.zeros(len(kx), np.int32)
        m = lib.radius_search(kx, mk, len(kx), x, y, radius, out)
        return out[:m]
    d = kx - [x, y]
    sel = (d[:, 0] ** 2 + d[:, 1] ** 2 <= radius * radius) & mask.astype(bool)
    return np.nonzero(sel)[0].astype(np.int32)


def descriptor_distances(query: np.ndarray, descs: np.ndarray) -> np.ndarray:
    lib = get_lib()
    q = np.ascontiguousarray(query, np.float32)
    d = np.ascontiguousarray(descs, np.float32)
    if lib is not None and d.shape[1] == 256:
        out = np.zeros(len(d), np.float32)
        lib.descriptor_distances(q, d, len(d), out)
        return out
    return 1.0 - d @ q
