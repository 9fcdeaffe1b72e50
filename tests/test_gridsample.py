import numpy as np
import jax.numpy as jnp

from airslam_tpu.ops.gridsample import remap, sample_descriptors


def np_extract_descriptors(desc, kpts, h, w, s):
    """Numpy oracle replicating the reference align-corners arithmetic
    (src/plnet.cpp:369-417)."""
    sx = 2.0 / (w * s - s / 2 - 0.5)
    bx = (1 - s) / (w * s - s / 2 - 0.5) - 1
    sy = 2.0 / (h * s - s / 2 - 0.5)
    by = (1 - s) / (h * s - s / 2 - 0.5) - 1

    def clip(v, m):
        return 0 if v < 0 else min(v, m - 1)

    out = np.zeros((kpts.shape[0], desc.shape[0]))
    for j, (x, y) in enumerate(kpts):
        xn = ((x * sx + bx) + 1) * 0.5
        yn = ((y * sy + by) + 1) * 0.5
        ix = xn * (w - 1)
        iy = yn * (h - 1)
        ix_nw, iy_nw = clip(int(np.floor(ix)), w), clip(int(np.floor(iy)), h)
        ix_ne, iy_ne = clip(ix_nw + 1, w), clip(iy_nw, h)
        ix_sw, iy_sw = clip(ix_nw, w), clip(iy_nw + 1, h)
        ix_se, iy_se = clip(ix_nw + 1, w), clip(iy_nw + 1, h)
        nw = (ix_se - ix) * (iy_se - iy)
        ne = (ix - ix_sw) * (iy_sw - iy)
        sw = (ix_ne - ix) * (iy - iy_ne)
        se = (ix - ix_nw) * (iy - iy_nw)
        out[j] = (
            desc[:, iy_nw, ix_nw] * nw
            + desc[:, iy_ne, ix_ne] * ne
            + desc[:, iy_sw, ix_sw] * sw
            + desc[:, iy_se, ix_se] * se
        )
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.clip(norms, 1e-12, None)


def test_sample_descriptors_matches_reference_arithmetic():
    rng = np.random.RandomState(0)
    h, w, c, s = 64, 64, 32, 8
    desc = rng.randn(c, h, w).astype(np.float64)
    kpts = rng.rand(40, 2) * np.array([w * s - 1, h * s - 1])
    ref = np_extract_descriptors(desc, kpts, h, w, s)
    ours = np.asarray(sample_descriptors(jnp.asarray(desc), jnp.asarray(kpts), s))
    assert np.allclose(ours, ref, atol=1e-10)


def test_sample_descriptors_normalized():
    rng = np.random.RandomState(1)
    desc = rng.randn(16, 8, 8)
    kpts = rng.rand(10, 2) * 60
    out = np.asarray(sample_descriptors(jnp.asarray(desc), jnp.asarray(kpts), 8))
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-10)


def test_remap_identity():
    rng = np.random.RandomState(2)
    img = rng.rand(32, 48)
    ys, xs = np.mgrid[0:32, 0:48].astype(np.float64)
    grid = np.stack([xs, ys], axis=-1)
    out = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
    assert np.allclose(out, img, atol=1e-12)


def test_remap_half_pixel_shift():
    img = np.arange(16, dtype=np.float64).reshape(4, 4)
    ys, xs = np.mgrid[0:4, 0:4].astype(np.float64)
    grid = np.stack([xs + 0.5, ys], axis=-1)
    out = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
    # interior: average of horizontal neighbors
    assert np.allclose(out[:, :3], (img[:, :3] + img[:, 1:]) / 2)


def test_remap_multichannel():
    rng = np.random.RandomState(3)
    img = rng.rand(16, 16, 3)
    grid = np.stack(np.meshgrid(np.arange(16.0), np.arange(16.0))[::1], axis=-1)
    xs, ys = np.meshgrid(np.arange(16.0), np.arange(16.0))
    grid = np.stack([xs, ys], axis=-1)
    out = np.asarray(remap(jnp.asarray(img), jnp.asarray(grid)))
    assert np.allclose(out, img, atol=1e-12)
