"""Native kernel tests: C++ results must equal the numpy fallbacks."""

import numpy as np
import pytest

from airslam_tpu.utils import native


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build of slam_kernels.cpp failed"


def _fallback(fn, *args, **kw):
    """Run a wrapper with the native lib temporarily disabled."""
    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        return fn(*args, **kw)
    finally:
        native._lib, native._tried = lib, tried


def test_invfile_query_matches_fallback():
    rng = np.random.RandomState(0)
    n_words, n_frames = 200, 30
    # random CSR inverted file
    entries = [(rng.randint(n_words), rng.randint(n_frames)) for _ in range(500)]
    entries.sort()
    words = np.asarray([w for w, _ in entries])
    frames = np.asarray([f for _, f in entries], np.int32)
    offsets = np.zeros(n_words + 1, np.int64)
    for w in words:
        offsets[w + 1] += 1
    offsets = np.cumsum(offsets)
    query = rng.randint(-1, n_words, 64).astype(np.int32)

    a = native.invfile_query(query, offsets, frames, n_frames)
    b = _fallback(native.invfile_query, query, offsets, frames, n_frames)
    assert np.array_equal(a, b)
    assert a.sum() > 0


def test_union_find_matches_fallback():
    rng = np.random.RandomState(1)
    pairs = rng.randint(0, 50, (40, 2)).astype(np.int64)
    a = native.union_find(pairs, 50)
    b = _fallback(native.union_find, pairs, 50)
    assert np.array_equal(a, b)
    # roots are minimal representatives
    for i, r in enumerate(a):
        assert r <= i


def test_union_find_simple_chain():
    pairs = np.asarray([[0, 1], [1, 2], [5, 6]], np.int64)
    roots = native.union_find(pairs, 8)
    assert roots[0] == roots[1] == roots[2] == 0
    assert roots[5] == roots[6] == 5
    assert roots[3] == 3 and roots[7] == 7


def test_radius_search_matches_fallback():
    rng = np.random.RandomState(2)
    kpts = (rng.rand(300, 2) * 500).astype(np.float32)
    mask = rng.rand(300) > 0.3
    a = native.radius_search(kpts, mask, 250.0, 250.0, 60.0)
    b = _fallback(native.radius_search, kpts, mask, 250.0, 250.0, 60.0)
    assert np.array_equal(np.sort(a), np.sort(b))


def test_descriptor_distances():
    rng = np.random.RandomState(3)
    q = rng.randn(256).astype(np.float32)
    d = rng.randn(40, 256).astype(np.float32)
    a = native.descriptor_distances(q, d)
    b = _fallback(native.descriptor_distances, q, d)
    assert np.allclose(a, b, atol=1e-4)
    assert np.allclose(a, 1.0 - d @ q, atol=1e-4)
