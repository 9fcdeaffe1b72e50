"""Tiled Pallas TPU kernel for static-grid image remap (rectification).

The reference rectifies every frame on the host with ``cv::remap``
(src/camera.cc:161-182, called from the input thread, map_builder.cc:41-54).
The XLA formulation (``ops/gridsample.remap``) is a 4-tap advanced-indexing
gather — fine on CPU, but on TPU an image-sized gather lowers to serial
dynamic slices (no vector gather unit).

TPU-native design: the rectification grid is STATIC per camera, and although
source pixels deviate from their output position by up to ~±76 px (EuRoC
radtan corners), the deviation varies slowly — within a 32×128 output tile
the in-tile source window is only tens of pixels taller/wider than the tile
(EuRoC: +24 rows, +42 cols). So:

- the whole image sits VMEM-resident (≤3.7 MB for every supported camera),
- a grid over output tiles fetches each tile's source WINDOW with a dynamic
  slice (per-tile window origin via scalar prefetch),
- inside the kernel the 4-tap bilinear select is two one-hot contractions
  against the window: a row contraction on the MXU (≤2 nonzeros per row:
  the y0/y1 taps with their bilinear weights) and a masked lane reduction
  for the x taps.

The plan (window origins, in-window tap indices, weights) is computed once
per camera on the host; per-frame cost is pure MXU/VPU work with zero HBM
gathers. Numerics match ``ops/gridsample.remap`` exactly in f32: same
floor/clip tap arithmetic, same unclipped weights (tests/test_remap_tiled).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def available() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@dataclasses.dataclass(frozen=True)
class RemapPlan:
    """Host-built remap plan for one static grid and source shape."""

    src_h: int
    src_w: int
    src_hp: int  # padded source rows (>= lh)
    src_wp: int  # padded source cols (>= lw)
    out_h: int
    out_w: int
    th: int  # output tile rows
    tw: int  # output tile cols
    lh: int  # source window rows (multiple of 8)
    lw: int  # source window cols (multiple of 128)
    r0: jax.Array  # (nty, ntx) int32 window row origin
    c0: jax.Array  # (nty, ntx) int32 window col origin
    ky0: jax.Array  # (Hp, Wp) int32 in-window y0 tap
    ky1: jax.Array  # (Hp, Wp) int32 in-window y1 tap
    kx0: jax.Array  # (Hp, Wp) int32 in-window x0 tap
    kx1: jax.Array  # (Hp, Wp) int32 in-window x1 tap
    wy: jax.Array  # (Hp, Wp) f32 y fractional weight
    wx: jax.Array  # (Hp, Wp) f32 x fractional weight


def build_plan(grid: np.ndarray, src_shape: tuple,
               tile: tuple = (8, 128)) -> RemapPlan | None:
    """Build a remap plan from a host grid (Ho, Wo, 2) of (x, y) source
    coordinates (cv::remap convention, same as ``gridsample.remap``).
    Returns None when no tile/window configuration fits (pathological grid)
    — callers then fall back to the generic path."""
    h, w = int(src_shape[0]), int(src_shape[1])
    grid = np.asarray(grid, np.float64)
    ho, wo = grid.shape[0], grid.shape[1]
    x = grid[..., 0]
    y = grid[..., 1]
    # identical tap arithmetic to gridsample.remap: unclipped fractional
    # weights, clipped integer taps
    x0f = np.floor(x)
    y0f = np.floor(y)
    wx = (x - x0f).astype(np.float32)
    wy = (y - y0f).astype(np.float32)
    x0i = np.clip(x0f.astype(np.int64), 0, w - 1)
    x1i = np.clip(x0i + 1, 0, w - 1)
    y0i = np.clip(y0f.astype(np.int64), 0, h - 1)
    y1i = np.clip(y0i + 1, 0, h - 1)

    th, tw = tile
    hp, wp = _round_up(ho, th), _round_up(wo, tw)

    def pad(a):
        # edge-replicate so padded slots share their neighbors' taps and
        # never widen a tile's source window
        return np.pad(a, ((0, hp - ho), (0, wp - wo)), mode="edge")

    y0p, y1p = pad(y0i), pad(y1i)
    x0p, x1p = pad(x0i), pad(x1i)
    wyp, wxp = pad(wy), pad(wx)

    nty, ntx = hp // th, wp // tw
    ys_min = y0p.reshape(nty, th, ntx, tw).min(axis=(1, 3))
    ys_max = y1p.reshape(nty, th, ntx, tw).max(axis=(1, 3))
    xs_min = x0p.reshape(nty, th, ntx, tw).min(axis=(1, 3))
    xs_max = x1p.reshape(nty, th, ntx, tw).max(axis=(1, 3))

    # Mosaic requires the dynamic window origin to be sublane/lane aligned
    # ("cannot statically prove index is a multiple of 8"): round origins
    # DOWN to (8, 128) multiples and widen the window to keep coverage
    lh = _round_up(int((ys_max - ys_min).max()) + 1 + 7, 8)
    lw = _round_up(int((xs_max - xs_min).max()) + 1 + 127, 128)
    # source smaller than a window: pad the source (remap_planned pads with
    # zeros — padded texels are always masked out by the one-hot taps, which
    # only ever address clipped in-range source pixels). Aligned dims keep
    # the clipped origins aligned too.
    src_hp = _round_up(max(h, lh), 8)
    src_wp = _round_up(max(w, lw), 128)

    r0 = (np.clip(ys_min, 0, src_hp - lh) // 8 * 8).astype(np.int32)
    c0 = (np.clip(xs_min, 0, src_wp - lw) // 128 * 128).astype(np.int32)

    r0e = np.repeat(np.repeat(r0, th, axis=0), tw, axis=1)
    c0e = np.repeat(np.repeat(c0, th, axis=0), tw, axis=1)
    return RemapPlan(
        src_h=h, src_w=w, src_hp=src_hp, src_wp=src_wp,
        out_h=ho, out_w=wo, th=th, tw=tw, lh=lh, lw=lw,
        r0=jnp.asarray(r0), c0=jnp.asarray(c0),
        ky0=jnp.asarray((y0p - r0e).astype(np.int32)),
        ky1=jnp.asarray((y1p - r0e).astype(np.int32)),
        kx0=jnp.asarray((x0p - c0e).astype(np.int32)),
        kx1=jnp.asarray((x1p - c0e).astype(np.int32)),
        wy=jnp.asarray(wyp), wx=jnp.asarray(wxp),
    )


def _kernel(r0_ref, c0_ref, ky0_ref, ky1_ref, kx0_ref, kx1_ref, wy_ref,
            wx_ref, img_ref, o_ref, *, th, tw, lh, lw):
    from jax.experimental import pallas as pl

    ti = pl.program_id(0)
    tj = pl.program_id(1)
    r0 = pl.multiple_of(r0_ref[ti, tj], 8)
    c0 = pl.multiple_of(c0_ref[ti, tj], 128)
    win = img_ref[pl.ds(r0, lh), pl.ds(c0, lw)]

    n = th * tw
    iol = jax.lax.broadcasted_iota(jnp.int32, (th, tw, lh), 2)
    wy = wy_ref[:]
    wrow = ((iol == ky0_ref[:][:, :, None]).astype(jnp.float32)
            * (1.0 - wy)[:, :, None]
            + (iol == ky1_ref[:][:, :, None]).astype(jnp.float32)
            * wy[:, :, None])
    rows = jnp.dot(wrow.reshape(n, lh), win,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (N, LW)

    iow = jax.lax.broadcasted_iota(jnp.int32, (th, tw, lw), 2)
    wx = wx_ref[:]
    wcol = ((iow == kx0_ref[:][:, :, None]).astype(jnp.float32)
            * (1.0 - wx)[:, :, None]
            + (iow == kx1_ref[:][:, :, None]).astype(jnp.float32)
            * wx[:, :, None])
    o_ref[:] = jnp.sum(rows.reshape(th, tw, lw) * wcol, axis=2)


@functools.partial(jax.jit, static_argnames=("th", "tw", "lh", "lw", "hp",
                                             "wp", "interpret"))
def _call(r0, c0, ky0, ky1, kx0, kx1, wy, wx, image, th, tw, lh, lw, hp, wp,
          interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nty, ntx = hp // th, wp // tw
    plane = pl.BlockSpec((th, tw), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[plane] * 6 + [
            pl.BlockSpec(image.shape, lambda i, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=plane,
    )
    return pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, lh=lh, lw=lw),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(r0, c0, ky0, ky1, kx0, kx1, wy, wx, image)


def remap_planned(image: jax.Array, plan: RemapPlan,
                  interpret: bool = False) -> jax.Array:
    """Remap a grayscale (H, W) image with a prebuilt plan. Returns
    (out_h, out_w) float32."""
    assert image.ndim == 2, "tiled remap supports single-channel images"
    img = image.astype(jnp.float32)
    if (plan.src_hp, plan.src_wp) != (plan.src_h, plan.src_w):
        img = jnp.pad(img, ((0, plan.src_hp - plan.src_h),
                            (0, plan.src_wp - plan.src_w)))
    hp = _round_up(plan.out_h, plan.th)
    wp = _round_up(plan.out_w, plan.tw)
    out = _call(plan.r0, plan.c0, plan.ky0, plan.ky1, plan.kx0, plan.kx1,
                plan.wy, plan.wx, img, plan.th, plan.tw, plan.lh, plan.lw,
                hp, wp, interpret)
    return out[: plan.out_h, : plan.out_w]
