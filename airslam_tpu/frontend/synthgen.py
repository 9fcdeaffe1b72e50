"""Synthetic-shapes scene generator for detector training — fully jittable,
so training data is rendered ON the TPU (no host data pipeline).

The reference consumes frozen TensorRT engines and cannot train; its PLNet
stage-0 checkpoint is not shipped (only the stage-1 head is). This module
bootstraps trained weights the SuperPoint way (arXiv 1712.07629 "Synthetic
Shapes"): random line segments and filled convex polygons rendered with
anti-aliasing, whose corners and edges are exact ground truth for the
keypoint heatmap, junction heatmap/offsets, line-proposal heads, and — via
affine-warped co-visible pairs — descriptor correspondence.

All shapes are static: S standalone segments + T triangles + Q quads per
image, corner/segment budgets padded with masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

SIZE = 512  # render resolution (the detector's input size)
N_SEG = 8  # standalone segments
N_TRI = 3  # filled triangles
N_QUAD = 3  # filled quads
N_POLY_V = 3 * N_TRI + 4 * N_QUAD
MAX_CROSS = 64
# region-contrast checker grid (region-boundary lines + X-crossing corners —
# the real-image pattern class pure strokes don't cover)
N_CHECK = 13  # grid lines per axis budget (pitch >= 44 px at 512)
CHECK_CROSS = N_CHECK * N_CHECK
MAX_CORNERS = 2 * N_SEG + N_POLY_V + MAX_CROSS + CHECK_CROSS
MAX_SEGMENTS = N_SEG + N_POLY_V + 2 * N_CHECK


class Shapes(NamedTuple):
    """Scene geometry in pixel coordinates (before rendering)."""

    segments: jax.Array  # (MAX_SEGMENTS, 4) — standalone, edges, checker grid
    segment_mask: jax.Array  # (MAX_SEGMENTS,)
    tri_verts: jax.Array  # (N_TRI, 3, 2)
    quad_verts: jax.Array  # (N_QUAD, 4, 2)
    fill_shade: jax.Array  # (N_TRI + N_QUAD,)
    stroke: jax.Array  # (MAX_SEGMENTS,)
    # checker region pattern: scene pos = origin + basis @ (cell coords);
    # shade 0 disables (half of scenes). Warping transforms origin/basis, so
    # crossings/lines stay exact in warped views.
    checker_origin: jax.Array  # (2,)
    checker_basis: jax.Array  # (2, 2)
    checker_shade: jax.Array  # ()


class Scene(NamedTuple):
    image: jax.Array  # (H, W) float in [0, 1]
    corners: jax.Array  # (C, 2) xy pixel coords
    corner_mask: jax.Array  # (C,)
    segments: jax.Array  # (S, 4) x1 y1 x2 y2
    segment_mask: jax.Array  # (S,)


def _seg_dist(px, py, seg):
    """Distance from every pixel to a segment. px/py: (H, W); seg: (4,)."""
    ax, ay, bx, by = seg[0], seg[1], seg[2], seg[3]
    dx, dy = bx - ax, by - ay
    L2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
    t = jnp.clip(((px - ax) * dx + (py - ay) * dy) / L2, 0.0, 1.0)
    qx = ax + t * dx
    qy = ay + t * dy
    return jnp.sqrt((px - qx) ** 2 + (py - qy) ** 2)


def _halfplane(px, py, a, b, c):
    """Signed distance of pixels to the line through a->b; positive on the
    side of c (so the polygon interior is positive)."""
    nx, ny = b[1] - a[1], a[0] - b[0]
    nrm = jnp.sqrt(nx * nx + ny * ny) + 1e-6
    nx, ny = nx / nrm, ny / nrm
    d = (px - a[0]) * nx + (py - a[1]) * ny
    s = jnp.sign((c[0] - a[0]) * nx + (c[1] - a[1]) * ny)
    return d * s


def _poly_fill(px, py, verts):
    """Soft inside-mask of a convex polygon given (V, 2) vertices."""
    v = verts
    n = v.shape[0]
    inside = jnp.full(px.shape, jnp.inf)
    centroid = jnp.mean(v, axis=0)
    for i in range(n):
        d = _halfplane(px, py, v[i], v[(i + 1) % n], centroid)
        inside = jnp.minimum(inside, d)
    return jax.nn.sigmoid(inside * 2.0)  # ~1 inside, ~0 outside, soft edge


def _seg_intersections(segs, mask):
    """Pairwise segment intersection points (static (S², 2) with validity)."""
    s = segs.shape[0]
    a = segs[:, None, :]  # (S, 1, 4)
    b = segs[None, :, :]  # (1, S, 4)
    x1, y1, x2, y2 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    x3, y3, x4, y4 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    safe = jnp.abs(den) > 1e-6
    den = jnp.where(safe, den, 1.0)
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    u = ((x1 - x3) * (y1 - y2) - (y1 - y3) * (x1 - x2)) / den
    hit = safe & (t > 0.02) & (t < 0.98) & (u > 0.02) & (u < 0.98)
    hit = hit & mask[:, None] & mask[None, :]
    hit = hit & (jnp.arange(s)[:, None] < jnp.arange(s)[None, :])  # upper tri
    ix = x1 + t * (x2 - x1)
    iy = y1 + t * (y2 - y1)
    pts = jnp.stack([ix, iy], axis=-1).reshape(s * s, 2)
    return pts, hit.reshape(s * s)


def sample_shapes(key, size: int = SIZE) -> Shapes:
    """Random scene geometry with static budgets."""
    ks = jax.random.split(key, 12)
    m = 24.0

    p1 = jax.random.uniform(ks[0], (N_SEG, 2), minval=m, maxval=size - m)
    p2 = jax.random.uniform(ks[1], (N_SEG, 2), minval=m, maxval=size - m)
    seg_ok = jnp.linalg.norm(p2 - p1, axis=-1) > 64.0
    segs = [jnp.concatenate([p1, p2], axis=-1)]
    seg_masks = [seg_ok]

    def polygon(key, nv, min_r, max_r):
        kc, kr, ka = jax.random.split(key, 3)
        c = jax.random.uniform(kc, (2,), minval=size * 0.2, maxval=size * 0.8)
        base = jax.random.uniform(ka, (), minval=0.0, maxval=6.28)
        ang = base + jnp.arange(nv) * (6.28318 / nv) + jax.random.uniform(
            kr, (nv,), minval=-0.35, maxval=0.35
        )
        r = jax.random.uniform(jax.random.fold_in(kr, 1), (nv,), minval=min_r, maxval=max_r)
        v = c[None, :] + jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1) * r[:, None]
        return jnp.clip(v, m, size - m)

    tri = jnp.stack([polygon(jax.random.fold_in(ks[2], i), 3, 40.0, 110.0)
                     for i in range(N_TRI)])
    quad = jnp.stack([polygon(jax.random.fold_in(ks[3], i), 4, 50.0, 130.0)
                      for i in range(N_QUAD)])
    for v in list(tri) + list(quad):
        e = jnp.concatenate([v, jnp.roll(v, -1, axis=0)], axis=-1)
        segs.append(e)
        seg_masks.append(jnp.ones((v.shape[0],), bool))

    fill_shade = jax.random.uniform(ks[4], (N_TRI + N_QUAD,), minval=-0.45, maxval=0.45)
    stroke = jax.random.uniform(ks[5], (MAX_SEGMENTS,), minval=-0.5, maxval=0.5)
    stroke = jnp.where(jnp.abs(stroke) < 0.25, jnp.sign(stroke) * 0.25, stroke)

    # checker region grid (half of scenes): region-boundary grid lines are
    # label-only segments (stroke 0 — their appearance comes from the region
    # pattern itself); crossings become corner labels in render_from_shapes
    k6, k7, k8, k9 = jax.random.split(ks[6], 4)
    on = (jax.random.uniform(k6, ()) < 0.5).astype(jnp.float32)
    pitch = jax.random.uniform(k7, (), minval=44.0, maxval=80.0)
    origin = jax.random.uniform(k8, (2,), minval=-80.0, maxval=0.0)
    delta = jax.random.uniform(k9, (), minval=0.10, maxval=0.30) * jnp.where(
        jax.random.uniform(jax.random.fold_in(k9, 1), ()) > 0.5, 1.0, -1.0)
    basis = pitch * jnp.eye(2)
    idx = jnp.arange(N_CHECK, dtype=jnp.float32)
    xs_g = origin[0] + idx * pitch
    ys_g = origin[1] + idx * pitch
    lo, hi = 3.0, SIZE - 3.0
    vsegs = jnp.stack([xs_g, jnp.full((N_CHECK,), lo), xs_g,
                       jnp.full((N_CHECK,), hi)], axis=-1)
    hsegs = jnp.stack([jnp.full((N_CHECK,), lo), ys_g,
                       jnp.full((N_CHECK,), hi), ys_g], axis=-1)
    vmask = (xs_g > lo) & (xs_g < hi) & (on > 0)
    hmask = (ys_g > lo) & (ys_g < hi) & (on > 0)
    segs.append(jnp.concatenate([vsegs, hsegs], axis=0))
    seg_masks.append(jnp.concatenate([vmask, hmask], axis=0))

    return Shapes(
        segments=jnp.concatenate(segs, axis=0),
        segment_mask=jnp.concatenate(seg_masks, axis=0),
        tri_verts=tri,
        quad_verts=quad,
        fill_shade=fill_shade,
        stroke=stroke.at[N_SEG + N_POLY_V:].set(0.0),
        checker_origin=origin,
        checker_basis=basis,
        checker_shade=delta * on,
    )


def warp_shapes(shapes: Shapes, A: jax.Array, t: jax.Array) -> Shapes:
    """Affine-transform all scene geometry: x' = A x + t."""

    def pt(p):  # (..., 2)
        return p @ A.T + t

    segs = shapes.segments
    return shapes._replace(
        segments=jnp.concatenate([pt(segs[:, 0:2]), pt(segs[:, 2:4])], axis=-1),
        tri_verts=pt(shapes.tri_verts),
        quad_verts=pt(shapes.quad_verts),
        checker_origin=pt(shapes.checker_origin),
        checker_basis=A @ shapes.checker_basis,
    )


def random_affine(key, size: int = SIZE, max_rot: float = 0.35,
                  scale_range=(0.85, 1.15), max_shift: float = 40.0):
    """Affine about the image center (for co-visible training pairs)."""
    k1, k2, k3 = jax.random.split(key, 3)
    th = jax.random.uniform(k1, (), minval=-max_rot, maxval=max_rot)
    s = jax.random.uniform(k2, (), minval=scale_range[0], maxval=scale_range[1])
    c, sn = jnp.cos(th) * s, jnp.sin(th) * s
    A = jnp.array([[c, -sn], [sn, c]])
    center = jnp.asarray([size / 2.0, size / 2.0])
    shift = jax.random.uniform(k3, (2,), minval=-max_shift, maxval=max_shift)
    t = center - A @ center + shift
    return A, t


def render_from_shapes(key, shapes: Shapes, size: int = SIZE) -> Scene:
    """Render geometry with random photometrics; extract ground truth."""
    ks = jax.random.split(key, 4)
    px = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0) + 0.5

    g = jax.random.uniform(ks[0], (4, 4), minval=0.35, maxval=0.85)
    bg = jax.image.resize(g, (size, size), "bilinear")
    n = jax.random.uniform(ks[1], (32, 32), minval=-0.04, maxval=0.04)
    bg = bg + jax.image.resize(n, (size, size), "bilinear")

    img = bg
    # region-contrast checker (anti-aliased): cell coords from the warped
    # frame, so the pattern is geometrically consistent with the labels
    Uinv = jnp.linalg.inv(shapes.checker_basis)
    dx = px - shapes.checker_origin[0]
    dy = py - shapes.checker_origin[1]
    cxc = Uinv[0, 0] * dx + Uinv[0, 1] * dy
    cyc = Uinv[1, 0] * dx + Uinv[1, 1] * dy
    pattern = jnp.tanh(jnp.sin(jnp.pi * cxc) * jnp.sin(jnp.pi * cyc) * 6.0)
    img = img + shapes.checker_shade * pattern
    polys = list(shapes.tri_verts) + list(shapes.quad_verts)
    for v, s in zip(polys, shapes.fill_shade):
        f = _poly_fill(px, py, v)
        img = img * (1 - f) + jnp.clip(bg + s, 0.05, 0.95) * f

    for i_chunk in range(0, MAX_SEGMENTS, 8):
        chunk = shapes.segments[i_chunk: i_chunk + 8]
        d = jax.vmap(lambda s: _seg_dist(px, py, s))(chunk)  # (≤8, H, W)
        alpha = jnp.clip(1.6 - d, 0.0, 1.0)
        cmask = shapes.segment_mask[i_chunk: i_chunk + 8].astype(jnp.float32)
        cshade = shapes.stroke[i_chunk: i_chunk + 8]
        img = img + jnp.sum(alpha * cmask[:, None, None] * cshade[:, None, None], axis=0)
    img = jnp.clip(img, 0.0, 1.0)
    img = jnp.clip(img + jax.random.normal(ks[2], (size, size)) * 0.02, 0.0, 1.0)

    # ground-truth corners: segment endpoints, polygon vertices, crossings
    segs = shapes.segments
    smask = shapes.segment_mask
    base_c = jnp.concatenate(
        [segs[:N_SEG, 0:2], segs[:N_SEG, 2:4],
         shapes.tri_verts.reshape(-1, 2), shapes.quad_verts.reshape(-1, 2)],
        axis=0,
    )
    base_m = jnp.concatenate(
        [smask[:N_SEG], smask[:N_SEG], jnp.ones((N_POLY_V,), bool)], axis=0
    )
    xpts, xmask = _seg_intersections(segs[:N_SEG], smask[:N_SEG])
    _, sel = jax.lax.top_k(xmask.astype(jnp.float32), MAX_CROSS)
    # checker X-crossings: origin + basis @ (i, j) (exact under warping)
    ij = jnp.stack(jnp.meshgrid(jnp.arange(N_CHECK, dtype=jnp.float32),
                                jnp.arange(N_CHECK, dtype=jnp.float32),
                                indexing="ij"), -1).reshape(-1, 2)
    cpts = shapes.checker_origin[None, :] + ij @ shapes.checker_basis.T
    cmask_chk = jnp.full((CHECK_CROSS,), shapes.checker_shade != 0.0)
    # crossings hidden under filled polygons are not corners in the image
    for v in list(shapes.tri_verts) + list(shapes.quad_verts):
        cmask_chk = cmask_chk & (_poly_fill(cpts[:, 0], cpts[:, 1], v) < 0.5)
    corners = jnp.concatenate([base_c, xpts[sel], cpts], axis=0)
    corner_mask = jnp.concatenate([base_m, xmask[sel], cmask_chk], axis=0)
    corner_mask = corner_mask & jnp.all(
        (corners > 4.0) & (corners < size - 4.0), axis=-1
    )
    in_img = jnp.all((segs.reshape(-1, 2, 2) > 2.0)
                     & (segs.reshape(-1, 2, 2) < size - 2.0), axis=(1, 2))
    return Scene(
        image=img,
        corners=corners,
        corner_mask=corner_mask,
        segments=segs,
        segment_mask=smask & in_img,
    )


# ---------------------------------------------------------------------------
# Photometric augmentation — the training-side counterpart of AirSLAM's
# headline claim ("illumination-robust point-line SLAM", README.md:1; the
# dark-EuRoC pipeline configs/visual_odometry/vo_euroc_dark.yaml). Each view
# of a training pair is augmented INDEPENDENTLY, so the detector/descriptor
# must be invariant to strong brightness/gamma/contrast/vignette asymmetry
# between matched views.
# ---------------------------------------------------------------------------


def photometric_augment(key, img, strength: float = 1.0):
    """Random photometric transform of a [0, 1] grayscale image (jittable).

    Composition (each sampled per call):
    - global illumination scale: log-uniform brightness in [~0.22, ~1.5]×
      (reaches the ~4× dark ratio of dark-EuRoC);
    - gamma in [0.45, 2.2] (crushes shadows / blows highlights);
    - contrast about the image mean;
    - vignette: radial falloff with random center and strength (lens +
      uneven lighting);
    - linear illumination gradient (one-sided light source);
    - sensor noise with a shot-noise term that GROWS as brightness falls
      (low light = noisy), matching real low-light statistics.
    """
    ks = jax.random.split(key, 9)
    h, w = img.shape[-2], img.shape[-1]
    # per-image strength draw: a quarter of renders stay near-clean, so the
    # detector keeps its clean-image precision while learning the dark tail
    s = strength * jax.random.uniform(ks[8], (), minval=0.15, maxval=1.0)

    # brightness (log-uniform) and gamma
    log_b = jax.random.uniform(ks[0], (), minval=-1.5 * s, maxval=0.4 * s)
    b = jnp.exp(log_b)
    log_g = jax.random.uniform(ks[1], (), minval=-0.8 * s, maxval=0.8 * s)
    gamma = jnp.exp(log_g)
    # contrast in [1-0.5s, 1+0.5s]
    c = 1.0 + jax.random.uniform(ks[2], (), minval=-0.5 * s, maxval=0.5 * s)

    out = jnp.clip(img, 0.0, 1.0) ** gamma
    mean = jnp.mean(out)
    out = (out - mean) * c + mean
    out = out * b

    # vignette
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / h
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / w
    cen = jax.random.uniform(ks[3], (2,), minval=0.3, maxval=0.7)
    r2 = (px - cen[0]) ** 2 + (py - cen[1]) ** 2
    v_str = jax.random.uniform(ks[4], (), minval=0.0, maxval=0.8 * s)
    out = out * (1.0 - v_str * jnp.clip(r2 * 2.0, 0.0, 1.0))

    # linear illumination gradient (asymmetric light)
    gdir = jax.random.normal(ks[5], (2,))
    gdir = gdir / (jnp.linalg.norm(gdir) + 1e-9)
    g_str = jax.random.uniform(ks[6], (), minval=0.0, maxval=0.25 * s)
    out = out + g_str * ((px - 0.5) * gdir[0] + (py - 0.5) * gdir[1])

    # noise: read floor + shot noise rising as the scene darkens
    sigma = 0.01 + 0.05 * s * jnp.clip(1.0 - b, 0.0, 1.0)
    out = out + jax.random.normal(ks[7], (h, w)) * sigma
    return jnp.clip(out, 0.0, 1.0)


def dark_transform(key, img, level: float = 0.25, gamma: float = 1.8,
                   noise: float = 0.03):
    """Deterministic-strength low-light degradation (for rendering dark
    evaluation sequences — the dark-EuRoC stand-in): gamma crush to
    ``level`` of the original brightness plus sensor noise."""
    out = jnp.clip(img, 0.0, 1.0) ** gamma * level
    out = out + jax.random.normal(key, img.shape) * noise
    return jnp.clip(out, 0.0, 1.0)


def render_scene(key, size: int = SIZE, augment: float = 0.0) -> Scene:
    k1, k2 = jax.random.split(key)
    s = render_from_shapes(k2, sample_shapes(k1, size), size)
    if augment > 0:
        s = s._replace(image=photometric_augment(
            jax.random.fold_in(key, 17), s.image, augment))
    return s


def render_pair_with_affine(key, size: int = SIZE, augment: float = 0.0,
                            view: float = 1.0):
    """:func:`render_pair` plus the ground-truth (A, t) map from view-0 to
    view-1 pixels (for detector-in-the-loop correspondence supervision).

    ``view`` > 1 widens the viewpoint gap: the affine strength multiplier is
    sampled per pair in [1, view] (rotation/scale/shift ranges all scale), so
    a curriculum keeps the easy pairs while adding hard ones — matcher
    fine-tuning for the relocalization viewpoint envelope."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shapes = sample_shapes(k1, size)
    if view > 1.0:
        v = 1.0 + (view - 1.0) * jax.random.uniform(jax.random.fold_in(key, 23))
        A, t = random_affine(k2, size, max_rot=0.35 * v,
                             scale_range=(1.0 - 0.15 * v, 1.0 + 0.15 * v),
                             max_shift=40.0 * v)
    else:
        A, t = random_affine(k2, size)
    s0 = render_from_shapes(k3, shapes, size)
    s1 = render_from_shapes(k4, warp_shapes(shapes, A, t), size)
    if augment > 0:
        # INDEPENDENT photometrics per view: the descriptors/matcher must
        # bridge strong illumination asymmetry (dark-EuRoC training-side)
        s0 = s0._replace(image=photometric_augment(
            jax.random.fold_in(key, 18), s0.image, augment))
        s1 = s1._replace(image=photometric_augment(
            jax.random.fold_in(key, 19), s1.image, augment))
    return s0, s1, A, t


def render_pair(key, size: int = SIZE, augment: float = 0.0):
    """Two photometrically-independent renders of the same scene related by
    a known affine — corner i in view 0 corresponds to corner i in view 1
    (exact descriptor supervision)."""
    s0, s1, _, _ = render_pair_with_affine(key, size, augment)
    return s0, s1


def render_batch(key, batch: int, size: int = SIZE) -> Scene:
    return jax.vmap(lambda k: render_scene(k, size))(jax.random.split(key, batch))


def render_pair_batch(key, batch: int, size: int = SIZE):
    return jax.vmap(lambda k: render_pair(k, size))(jax.random.split(key, batch))


# ---------------------------------------------------------------------------
# 3D synthetic world → camera images (the EuRoC stand-in for end-to-end runs:
# consistent multi-view geometry, so the real detector+matcher can track)
# ---------------------------------------------------------------------------


class World3D(NamedTuple):
    segments: jax.Array  # (S, 2, 3) 3D segment endpoints (world)
    seg_shade: jax.Array  # (S,)
    blobs: jax.Array  # (B, 3) 3D dot features
    blob_shade: jax.Array  # (B,)


def make_world3d(key, n_seg: int = 48, n_blob: int = 320,
                 extent=((-4.0, 4.0), (-2.5, 2.5), (2.0, 20.0))) -> World3D:
    """Random wireframe-and-dots corridor. Segments hug axis-aligned planes so
    many are (detectably) straight edges; blobs give the point detector
    texture everywhere."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    (x0, x1), (y0, y1), (z0, z1) = extent

    def upts(k, n):
        u = jax.random.uniform(k, (n, 3))
        return jnp.stack([
            x0 + u[:, 0] * (x1 - x0),
            y0 + u[:, 1] * (y1 - y0),
            z0 + u[:, 2] * (z1 - z0),
        ], -1)

    a = upts(k1, n_seg)
    d = jax.random.normal(k2, (n_seg, 3))
    # squash one random axis so segments lie roughly in planes
    axis = jax.random.randint(k3, (n_seg,), 0, 3)
    d = d * (1.0 - jax.nn.one_hot(axis, 3) * 0.95)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
    length = jax.random.uniform(jax.random.fold_in(k2, 1), (n_seg, 1),
                                minval=0.8, maxval=3.0)
    b = a + d * length
    seg_shade = jax.random.uniform(jax.random.fold_in(k2, 2), (n_seg,),
                                   minval=0.25, maxval=0.55) * jnp.where(
        jax.random.uniform(jax.random.fold_in(k2, 3), (n_seg,)) > 0.5, 1.0, -1.0)
    blobs = upts(k4, n_blob)
    blob_shade = jax.random.uniform(k5, (n_blob,), minval=0.3, maxval=0.6) * jnp.where(
        jax.random.uniform(jax.random.fold_in(k5, 1), (n_blob,)) > 0.5, 1.0, -1.0)
    return World3D(jnp.stack([a, b], axis=1), seg_shade, blobs, blob_shade)


def _octave_noise(u, v, key, octaves: int = 5, amp: float = 1.0):
    """Smooth quasi-random 1/f texture over 2D surface coordinates (u, v) —
    natural-image-like power spectrum from summed directional sinusoids with
    random orientation/phase per octave. Fully jittable, view-independent
    (texture is a function of the SURFACE point, so multi-view photometric
    consistency is exact)."""
    out = jnp.zeros_like(u)
    for k in range(octaves):
        kk = jax.random.fold_in(key, k)
        th = jax.random.uniform(kk, (3,), minval=0.0, maxval=6.28318)
        f = (1.4 ** k) * 2.2
        d = u * jnp.cos(th[0]) + v * jnp.sin(th[0])
        e = u * jnp.cos(th[1] + 1.7) + v * jnp.sin(th[1] + 1.7)
        out = out + (amp / (1.35 ** k)) * jnp.sin(f * d + th[2]) * jnp.cos(
            0.73 * f * e + th[1])
    return out


def render_view3d(world: World3D, Rcw, tcw, fx, fy, cx, cy,
                  height: int, width: int, key=None,
                  texture: float = 0.0, texture_key=None,
                  floor_y: float = 2.8, wall_z: float = 20.5):
    """Rasterize the world into one grayscale view (H, W) in [0, 1].

    Segments are clipped to z>0.2 and drawn as anti-aliased strokes; blobs as
    small gaussians. Fully jittable — a whole stereo sequence renders as one
    device program.

    ``texture > 0`` adds 1/f procedural texture on two REAL 3D planes (floor
    at y=``floor_y``, back wall at z=``wall_z``): each pixel's ray is
    intersected with the planes and the texture sampled at the world-space
    hit point — photometrically consistent and correctly parallax-shifted
    across views (natural-image statistics for the CNN, and triangulable
    texture detail for the SLAM chain)."""
    px = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) + 0.5

    def proj(p3):  # (..., 3) world -> (..., 2) pixels + depth
        pc = p3 @ Rcw.T + tcw
        z = jnp.maximum(pc[..., 2], 0.2)
        return jnp.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy], -1), pc[..., 2]

    img = jnp.full((height, width), 0.55)
    if texture > 0.0:
        tkey = texture_key if texture_key is not None else jax.random.PRNGKey(7)
        # world-frame ray through each pixel and camera centre
        dx = (px - cx) / fx
        dy = (py - cy) / fy
        d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)  # (H, W, 3)
        d_w = d_cam @ Rcw  # = Rcw^T applied per-pixel
        C = -Rcw.T @ tcw  # camera centre (world)
        eps = 1e-6
        # floor plane y = floor_y (image-down is +y with the identity pose)
        t_f = (floor_y - C[1]) / jnp.where(jnp.abs(d_w[..., 1]) < eps, eps, d_w[..., 1])
        # back wall z = wall_z
        t_wz = (wall_z - C[2]) / jnp.where(jnp.abs(d_w[..., 2]) < eps, eps, d_w[..., 2])
        hits = []
        for t_pl, uv_axes, kslot in ((t_f, (0, 2), 0), (t_wz, (0, 1), 1)):
            ok = t_pl > 0.2
            t_safe = jnp.where(ok, t_pl, 1e6)
            hit = C[None, None, :] + t_safe[..., None] * d_w
            tex = _octave_noise(hit[..., uv_axes[0]], hit[..., uv_axes[1]],
                                jax.random.fold_in(tkey, kslot))
            hits.append((t_safe, jnp.where(ok, tex, 0.0)))
        # nearest plane wins
        t0, tex0 = hits[0]
        t1, tex1 = hits[1]
        tex = jnp.where(t0 < t1, tex0, tex1)
        t_near = jnp.minimum(t0, t1)
        # gentle distance attenuation keeps far texture low-contrast
        att = 1.0 / (1.0 + 0.05 * t_near)
        img = img + texture * tex * att
    else:
        # legacy flat shading (kept for byte-identical pre-texture renders)
        u = (px / width * 8).astype(jnp.int32) + (py / height * 6).astype(jnp.int32)
        img = img + 0.04 * jnp.cos(u.astype(jnp.float32) * 2.1)

    p2a, za = proj(world.segments[:, 0])
    p2b, zb = proj(world.segments[:, 1])
    vis = (za > 0.25) & (zb > 0.25)
    segs2d = jnp.concatenate([p2a, p2b], axis=-1)
    n = segs2d.shape[0]
    for i0 in range(0, n, 8):
        ch = segs2d[i0: i0 + 8]
        d = jax.vmap(lambda s: _seg_dist(px, py, s))(ch)
        alpha = jnp.clip(1.8 - d, 0.0, 1.0)
        w = vis[i0: i0 + 8].astype(jnp.float32) * world.seg_shade[i0: i0 + 8]
        img = img + jnp.sum(alpha * w[:, None, None], axis=0)

    pb, zbl = proj(world.blobs)
    bvis = (zbl > 0.25).astype(jnp.float32)
    m = world.blobs.shape[0]
    for i0 in range(0, m, 32):
        dx = px[None] - pb[i0: i0 + 32, 0][:, None, None]
        dy = py[None] - pb[i0: i0 + 32, 1][:, None, None]
        g = jnp.exp(-(dx * dx + dy * dy) / 8.0)
        w = bvis[i0: i0 + 32] * world.blob_shade[i0: i0 + 32]
        img = img + jnp.sum(g * w[:, None, None], axis=0)

    img = jnp.clip(img, 0.02, 0.98)
    if key is not None:
        img = jnp.clip(img + jax.random.normal(key, img.shape) * 0.01, 0.0, 1.0)
    return img
