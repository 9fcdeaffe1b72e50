"""Tiled Pallas remap (rectification) vs the generic gather formulation.

The plan-based kernel must reproduce ``gridsample.remap`` exactly in f32 —
same floor/clip tap arithmetic, same unclipped weights — on the REAL
rectification grids the cameras produce (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from airslam_tpu.ops import remap_tiled
from airslam_tpu.ops.gridsample import remap

EUROC_YAML = "/root/reference/configs/camera/euroc.yaml"


def _random_smooth_grid(rng, ho, wo, amp):
    """Output grid = identity + smooth low-frequency deviation field."""
    gy, gx = np.mgrid[0:ho, 0:wo].astype(np.float64)
    fy = amp * np.sin(gy / 37.0) * np.cos(gx / 53.0)
    fx = amp * np.cos(gy / 41.0) * np.sin(gx / 29.0)
    return np.stack([gx + fx + rng.randn(), gy + fy + rng.randn()],
                    axis=-1).astype(np.float32)


@pytest.mark.parametrize("amp", [0.0, 3.5, 17.0])
def test_matches_generic_remap_smooth_grid(amp):
    rng = np.random.RandomState(int(amp * 10) + 1)
    h, w = 96, 256
    img = rng.rand(h, w).astype(np.float32)
    grid = _random_smooth_grid(rng, h, w, amp)
    plan = remap_tiled.build_plan(grid, (h, w), tile=(8, 128))
    assert plan is not None
    got = np.asarray(remap_tiled.remap_planned(jnp.asarray(img), plan,
                                               interpret=True))
    want = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_out_of_bounds_taps_clamp_like_generic():
    rng = np.random.RandomState(7)
    h, w = 64, 128
    img = rng.rand(h, w).astype(np.float32)
    # grid pointing beyond every border
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float64)
    grid = np.stack([gx * 1.3 - 20.0, gy * 1.4 - 15.0], -1).astype(np.float32)
    plan = remap_tiled.build_plan(grid, (h, w), tile=(8, 128))
    if plan is None:
        pytest.skip("window exceeds source (expected for extreme grids)")
    got = np.asarray(remap_tiled.remap_planned(jnp.asarray(img), plan,
                                               interpret=True))
    want = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_euroc_rectification_grids_exact():
    import os

    if not os.path.exists(EUROC_YAML):
        pytest.skip("reference configs not mounted")
    from airslam_tpu.core.camera import Camera

    cam = Camera(EUROC_YAML)
    rng = np.random.RandomState(0)
    for grid in (cam.map_left, cam.map_right):
        h, w = grid.shape[0], grid.shape[1]
        img = rng.rand(h, w).astype(np.float32)
        plan = remap_tiled.build_plan(grid, (h, w))
        assert plan is not None
        # EuRoC windows stay compact: the whole point of the tiling
        # (includes the (8, 128) origin-alignment slack Mosaic requires)
        assert plan.lh <= 64 and plan.lw <= 384
        got = np.asarray(remap_tiled.remap_planned(jnp.asarray(img), plan,
                                                   interpret=True))
        want = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_non_tile_multiple_output():
    rng = np.random.RandomState(3)
    h, w = 70, 150  # neither multiple of the tile
    img = rng.rand(h, w).astype(np.float32)
    grid = _random_smooth_grid(rng, h, w, 2.0)
    plan = remap_tiled.build_plan(grid, (h, w), tile=(8, 128))
    assert plan is not None
    got = np.asarray(remap_tiled.remap_planned(jnp.asarray(img), plan,
                                               interpret=True))
    assert got.shape == (h, w)
    want = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_map_builder_rectify_tiled_path(monkeypatch):
    """MapBuilder.rectify must produce the same rectified images through the
    tiled Pallas path (forced on, interpret mode) as through the generic
    gather remap."""
    import os

    if not os.path.exists(EUROC_YAML):
        pytest.skip("reference configs not mounted")
    from airslam_tpu.core.camera import Camera
    from airslam_tpu.pipelines.map_builder import MapBuilder

    cam = Camera(EUROC_YAML)
    b = MapBuilder.__new__(MapBuilder)  # rectify needs only camera + maps
    b.camera = cam
    b._maps = cam.rectify_maps()

    rng = np.random.RandomState(5)
    h, w = cam.map_left.shape[:2]
    left = rng.rand(h, w).astype(np.float32)
    right = rng.rand(h, w).astype(np.float32)

    l_gen, r_gen = MapBuilder.rectify(b, left, right)  # CPU → generic path

    monkeypatch.setattr(remap_tiled, "available", lambda: True)
    orig = remap_tiled.remap_planned
    monkeypatch.setattr(remap_tiled, "remap_planned",
                        lambda img, plan: orig(img, plan, interpret=True))
    l_til, r_til = MapBuilder.rectify(b, left, right)

    np.testing.assert_allclose(np.asarray(l_til), np.asarray(l_gen), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r_til), np.asarray(r_gen), atol=1e-5)
