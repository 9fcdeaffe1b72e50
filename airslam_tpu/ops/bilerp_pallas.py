"""Fused bilinear point-sampling as a Pallas TPU kernel.

The LOI verification head samples L·30 interior points + 2L endpoints from
three small (128, 128, C) feature maps per view (plnet.cpp:519-558 semantics,
re-derived from the shipped plnet_s1.onnx). The XLA formulation
(``models/plnet._onnx_bilerp``) contracts one-hot row/column weight matrices
on the MXU, but its row-gather intermediate ``(N, W, C)`` round-trips HBM —
at L=512 candidates that is ~16 MB per map per view, the head's largest HBM
tenant (profiled 0.66 ms/frame of a 3.9 ms frontend).

The maps themselves are tiny (64 KB–4.2 MB), so the whole operation is
VMEM-resident: this kernel blocks the N sample points, keeps the feature map
resident across grid steps (constant ``index_map`` — fetched once), and fuses
both contractions in VMEM scratch, so only the (N,) coordinates and (N, C)
outputs ever touch HBM.

Corner/clamp arithmetic is exactly ``_onnx_bilerp``'s (x0 = clip(floor(x),
0, W−1), x1 = clip(x0+1, 0, W−1), UNclamped weights — zero total weight at
the far border, mild extrapolation below 0), with the same bf16 weight
rounding when the map is bf16; the row contraction accumulates in f32
(strictly tighter than the XLA bf16 path's bf16 ``rows`` intermediate).
Equivalence is tested in tests/test_bilerp_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def available() -> bool:
    return jax.default_backend() == "tpu"


def _block_n(w: int, c: int, budget: int = 4 * 2**20) -> int:
    """Largest power-of-two sample block whose (NB, W, C) f32 intermediate
    stays within ``budget`` bytes of VMEM scratch (≥8, ≤512)."""
    nb = max(1, budget // (w * c * 4))
    nb = 1 << (nb.bit_length() - 1)
    return max(8, min(512, nb))


def _kernel(x_ref, y_ref, f_ref, o_ref, *, h, w, c):
    # f_ref holds the map TRANSPOSED to (H, C·W): the row contraction then
    # yields (NB, C·W), which Mosaic can reshape to (NB, C, W) because the
    # minormost dim stays the lane-aligned W=128 (the natural (NB, W·C)
    # layout needs a lane-splitting shape cast Mosaic rejects).
    x = x_ref[:, 0]  # (NB,) f32
    y = y_ref[:, 0]
    nb = x.shape[0]
    x0f = jnp.clip(jnp.floor(x), 0.0, w - 1)
    x1f = jnp.clip(x0f + 1.0, 0.0, w - 1)
    y0f = jnp.clip(jnp.floor(y), 0.0, h - 1)
    y1f = jnp.clip(y0f + 1.0, 0.0, h - 1)

    fm = f_ref[:]  # (H, C·W), VMEM-resident across grid steps
    ioh = jax.lax.broadcasted_iota(jnp.int32, (nb, h), 1)
    wy = ((ioh == y0f.astype(jnp.int32)[:, None]) * (y1f - y)[:, None]
          + (ioh == y1f.astype(jnp.int32)[:, None]) * (y - y0f)[:, None])
    # HIGHEST for f32 maps: DEFAULT takes the MXU's single bf16 pass (~8e-3
    # relative error). Mosaic rejects fp32 contract precision on bf16
    # operands ("Bad lhs type"), so the production bf16 maps keep DEFAULT —
    # bf16×bf16 with f32 accumulation is single-pass exact either way.
    prec = (jax.lax.Precision.HIGHEST if fm.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    rows = jnp.dot(wy.astype(fm.dtype), fm,
                   preferred_element_type=jnp.float32,
                   precision=prec)  # (NB, C·W) f32

    # column weights expanded over the C·W lanes: lane index cw ↦ w = cw % W
    iow = jax.lax.broadcasted_iota(jnp.int32, (nb, c * w), 1) % w
    wx = ((iow == x0f.astype(jnp.int32)[:, None]) * (x1f - x)[:, None]
          + (iow == x1f.astype(jnp.int32)[:, None]) * (x - x0f)[:, None])
    o_ref[:] = jnp.sum((rows * wx).reshape(nb, c, w), axis=2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "c", "nb", "interpret"))
def _call(x, y, fmap2d, h, w, c, nb, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c * w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, y, fmap2d)


def bilerp_points(fmap: jax.Array, x: jax.Array, y: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Sample ``fmap`` (H, W, C) at float coordinates ``x``/``y`` (any shape)
    with the stage-1 ONNX corner arithmetic. Returns (..., C) float32."""
    h, w, c = fmap.shape
    shape = x.shape
    xf = x.reshape(-1).astype(jnp.float32)
    yf = y.reshape(-1).astype(jnp.float32)
    n = xf.shape[0]
    nb = _block_n(w, c)
    pad = -n % nb
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), jnp.float32)])
        yf = jnp.concatenate([yf, jnp.zeros((pad,), jnp.float32)])
    fmap_t = fmap.transpose(0, 2, 1).reshape(h, c * w)  # (H, C·W), see kernel
    out = _call(xf[:, None], yf[:, None], fmap_t, h, w, c, nb, interpret)
    return out[:n].reshape(shape + (c,))


# ---------------------------------------------------------------------------
# lane-packed variant: points in LANES, output channel-major (C, N)
# ---------------------------------------------------------------------------


def _kernel_t(x_ref, y_ref, f_ref, o_ref, *, h, w, c, nbr):
    """Transposed formulation: the NB sample points of this grid step live in
    the LANE dimension end-to-end ((nbr, 128) blocks), so the coordinate
    arrays are dense — the (N, 1) layout of the row-major kernel tiles as
    (8, 128) blocks with ONE valid lane, which made the coords' producer
    fusion and the kernel's coordinate reads ~0.4 ms/frame at L=512.
    Same corner arithmetic and rounding as :func:`_kernel` (weights cast to
    the map dtype for the row contraction, f32 accumulation)."""
    x = x_ref[:]  # (nbr, 128) f32
    y = y_ref[:]
    nb = nbr * 128
    x0f = jnp.clip(jnp.floor(x), 0.0, w - 1)
    x1f = jnp.clip(x0f + 1.0, 0.0, w - 1)
    y0f = jnp.clip(jnp.floor(y), 0.0, h - 1)
    y1f = jnp.clip(y0f + 1.0, 0.0, h - 1)

    fm = f_ref[:]  # (H, C·W), VMEM-resident across grid steps
    ioh = jax.lax.broadcasted_iota(jnp.int32, (h, nbr, 128), 0)
    wy = ((ioh == y0f.astype(jnp.int32)[None]) * (y1f - y)[None]
          + (ioh == y1f.astype(jnp.int32)[None]) * (y - y0f)[None])
    # rowsT[cw, p] = Σ_h fm[h, cw] · wy[h, p] — contraction over H on the MXU
    prec = (jax.lax.Precision.HIGHEST if fm.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)  # see _kernel
    rows = jax.lax.dot_general(
        fm, wy.reshape(h, nb).astype(fm.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)  # (C·W, NB) f32
    # column weights: 4-D iota gives the lane-w index without a mod
    iow = jax.lax.broadcasted_iota(jnp.int32, (c, w, nbr, 128), 1)
    wx = ((iow == x0f.astype(jnp.int32)[None, None])
          * (x1f - x)[None, None]
          + (iow == x1f.astype(jnp.int32)[None, None])
          * (x - x0f)[None, None]).reshape(c * w, nb)
    o_ref[:] = jnp.sum((rows * wx).reshape(c, w, nb), axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "c", "nbr", "interpret"))
def _call_t(x2, y2, fmap2d, h, w, c, nbr, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x2.shape[0] * 128
    nb = nbr * 128
    return pl.pallas_call(
        functools.partial(_kernel_t, h=h, w=w, c=c, nbr=nbr),
        out_shape=jax.ShapeDtypeStruct((c, n), jnp.float32),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nbr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c * w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, nb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, y2, fmap2d)


def bilerp_points_t(fmap: jax.Array, x: jax.Array, y: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Lane-packed bilinear sampling: same semantics as :func:`bilerp_points`
    but returns CHANNEL-MAJOR (C, ...) float32 — the layout the stage-1 LOI
    head's thin/aux flatten wants anyway (ONNX Transpose([1,0,2]))."""
    h, w, c = fmap.shape
    shape = x.shape
    # Mosaic requires the (nbr, 128) coordinate blocks to tile as (8, 128):
    # maps whose C·W is too large for an 8-row block's (C·W, 1024) f32
    # intermediate (~2 MB budget → C·W ≤ 512; the production LOI thin/aux
    # maps are (128, 128, 4) = 512) can't run lane-packed — fall back to the
    # row-major kernel, whose (NB, 1) coords tile legally at any NB ≥ 8.
    nbr = (2 * 2**20) // (c * w * 4 * 128)
    if nbr < 8:
        out = bilerp_points(fmap, x, y, interpret=interpret)  # (..., C)
        return jnp.moveaxis(out, -1, 0)
    nbr = 8
    xf = x.reshape(-1).astype(jnp.float32)
    yf = y.reshape(-1).astype(jnp.float32)
    n = xf.shape[0]
    nb = nbr * 128
    pad = -n % nb
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad,), jnp.float32)])
        yf = jnp.concatenate([yf, jnp.zeros((pad,), jnp.float32)])
    fmap_t = fmap.transpose(0, 2, 1).reshape(h, c * w)
    out = _call_t(xf.reshape(-1, 128), yf.reshape(-1, 128), fmap_t,
                  h, w, c, nbr, interpret)
    return out[:, :n].reshape((c,) + shape)
