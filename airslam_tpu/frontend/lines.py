"""Line feature processing: point↔line association, line matching via shared
point matches, and line triangulation.

Replaces ``src/line_processor.cc``. TPU-native reformulations:

- ``AssignPointsToLines`` (line_processor.cc:68-120): the per-line loop over
  points becomes one dense (L, K) computation of point-line distance +
  bounding-box + endpoint-segment tests.
- ``MatchLines`` (line_processor.cc:122-180): the vote matrix over
  (line0, line1) is two boolean matmuls ``rel0 · M · rel1ᵀ`` with M the
  point-match incidence — MXU work instead of nested maps.
- ``TriangulateByStereo`` (line_processor.cc:196-245): batched over all line
  pairs; same gates (|dy| > 3 px, |angle| ≥ 0.175 rad, disparity bounds).
- ``TriangulateByTwoFrames`` (line_processor.cc:275-310): plane-plane
  intersection in closed form producing a Plücker (w, d) line.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from airslam_tpu.core import lie

POINT_LINE_DIST = 3.0  # px


@partial(jax.jit, static_argnames=("max_dist",))
def point_line_relation(lines, line_mask, kpts, kp_mask, max_dist: float = POINT_LINE_DIST):
    """Dense point-on-line relation.

    lines: (L, 4) endpoints; kpts: (K, 2). Returns (rel (L, K) bool,
    dist (L, K)). A point belongs to a line iff it is within ``max_dist`` px
    of the infinite line, inside the segment bbox inflated by 3 px, and near
    the segment (endpoint balls of radius 3 or the obtuse-angle test) —
    line_processor.cc:92-116.
    """
    x1, y1, x2, y2 = lines[:, 0], lines[:, 1], lines[:, 2], lines[:, 3]
    px, py = kpts[:, 0], kpts[:, 1]

    a = (y2 - y1)[:, None]
    b = (x1 - x2)[:, None]
    c = (x2 * y1 - x1 * y2)[:, None]
    d = jnp.sqrt(a * a + b * b)
    dist = jnp.abs(a * px[None, :] + b * py[None, :] + c) / jnp.clip(d, 1e-12)

    min_x = jnp.minimum(x1, x2)[:, None] - max_dist
    max_x = jnp.maximum(x1, x2)[:, None] + max_dist
    min_y = jnp.minimum(y1, y2)[:, None] - max_dist
    max_y = jnp.maximum(y1, y2)[:, None] + max_dist
    in_box = (
        (px[None, :] >= min_x) & (px[None, :] <= max_x)
        & (py[None, :] >= min_y) & (py[None, :] <= max_y)
    )

    side1 = (x1[:, None] - px[None, :]) ** 2 + (y1[:, None] - py[None, :]) ** 2
    side2 = (x2[:, None] - px[None, :]) ** 2 + (y2[:, None] - py[None, :]) ** 2
    line_len2 = (d * d)
    near_segment = (
        (side1 <= 9.0) | (side2 <= 9.0)
        | ((side1 < line_len2 + side2) & (side2 < line_len2 + side1))
    )

    rel = (
        (dist <= max_dist) & in_box & near_segment
        & line_mask[:, None] & kp_mask[None, :]
    )
    return rel, dist


@partial(jax.jit, static_argnames=("min_votes", "min_score"))
def match_lines_by_points(rel0, rel1, match_idx1, match_mask, min_votes: int = 2,
                          min_score: float = 0.8):
    """Line matching from shared point matches (line_processor.cc:122-180).

    rel0: (L0, K0) bool point-on-line; rel1: (L1, K1); match_idx1: (K0,) the
    image-1 index each image-0 point matched (−1 invalid); match_mask: (K0,).
    Returns (L0,) int32 line match indices into image 1 (−1 = none).

    Votes as matmul: M (K0, K1) one-hot of matches; V = rel0 · M · rel1ᵀ.
    Acceptance: mutual row/col argmax, ≥ min_votes, and
    votes² / min(|pts0|, |pts1|) ≥ min_score.
    """
    k1 = rel1.shape[1]
    safe_idx = jnp.where(match_mask, match_idx1, 0)
    m = (jax.nn.one_hot(safe_idx, k1, dtype=jnp.float32)
         * match_mask[:, None].astype(jnp.float32))  # (K0, K1)
    votes = rel0.astype(jnp.float32) @ m @ rel1.astype(jnp.float32).T  # (L0, L1)

    row_best = jnp.argmax(votes, axis=1).astype(jnp.int32)
    col_best = jnp.argmax(votes, axis=0).astype(jnp.int32)
    # reduction forms of value-at-argmax / mutuality / n1[row_best]: TPU
    # lowers 1-D gathers to serial dynamic-slices; these stay on the VPU
    best_v = jnp.max(votes, axis=1)
    ioj = jax.lax.broadcasted_iota(jnp.int32, votes.shape, 1)
    ioi = jax.lax.broadcasted_iota(jnp.int32, votes.shape, 0)
    at_best = ioj == row_best[:, None]
    mutual = jnp.any(at_best & (col_best[None, :] == ioi), axis=1)

    n0 = jnp.sum(rel0, axis=1).astype(jnp.float32)  # (L0,)
    n1 = jnp.sum(rel1, axis=1).astype(jnp.float32)  # (L1,)
    n1_at = jnp.max(jnp.where(at_best, n1[None, :], -jnp.inf), axis=1)
    denom = jnp.minimum(n0, n1_at)
    score = best_v * best_v / jnp.clip(denom, 1.0)

    ok = mutual & (best_v >= min_votes) & (score >= min_score)
    return jnp.where(ok, row_best, -jnp.ones_like(row_best))


@jax.jit
def frame_relations(lines_l, lmask_l, kpts_l, kmask_l,
                    lines_r, lmask_r, kpts_r, kmask_r, idx1, msk):
    """Per-frame line bookkeeping fused into ONE dispatch (host-budget cut):
    left point-on-line relation + right relation + stereo line match via
    shared point matches. Three separate jitted calls cost 3× dispatch glue
    + device_put per frame on the builder's host path."""
    rel_l, _ = point_line_relation(lines_l, lmask_l, kpts_l, kmask_l)
    rel_r, _ = point_line_relation(lines_r, lmask_r, kpts_r, kmask_r)
    lm = match_lines_by_points(rel_l, rel_r, idx1, msk)
    return rel_l, lm


@jax.jit
def triangulate_stereo_lines(lines_left, lines_right, valid, Rwc, twc, intr,
                             min_x_diff, max_x_diff):
    """Batched stereo line triangulation (line_processor.cc:196-245).

    lines_left/right: (L, 4) matched rectified segments. Returns
    (endpoints_w (L, 6) world endpoints, ok (L,))."""
    x11, y11, x12, y12 = (lines_left[:, i] for i in range(4))
    x21, y21, x22, y22 = (lines_right[:, i] for i in range(4))

    dxl = x12 - x11
    dyl = y12 - y11
    angle_l = jnp.arctan(dyl / jnp.where(jnp.abs(dxl) < 1e-9, 1e-9, dxl))
    dxr = x22 - x21
    dyr = y22 - y21
    angle_r = jnp.arctan(dyr / jnp.where(jnp.abs(dxr) < 1e-9, 1e-9, dxr))
    not_horizontal = (
        (jnp.abs(dyl) > 3) & (jnp.abs(angle_l) >= 0.175)
        & (jnp.abs(dyr) > 3) & (jnp.abs(angle_r) >= 0.175)
    )

    k_inv = dxr / jnp.where(jnp.abs(dyr) < 1e-9, 1e-9, dyr)
    x11r = x21 + k_inv * (y11 - y21)
    x12r = x21 + k_inv * (y12 - y21)

    d1 = x11 - x11r
    d2 = x12 - x12r
    disp_ok = (d1 >= min_x_diff) & (d1 <= max_x_diff) & (d2 >= min_x_diff) & (d2 <= max_x_diff)

    p1 = intr.back_project_stereo(jnp.stack([x11, y11, x11r], axis=-1))
    p2 = intr.back_project_stereo(jnp.stack([x12, y12, x12r], axis=-1))
    p1w = jnp.einsum("ij,lj->li", Rwc, p1) + twc
    p2w = jnp.einsum("ij,lj->li", Rwc, p2) + twc
    ok = valid & not_horizontal & disp_ok
    return jnp.concatenate([p1w, p2w], axis=-1), ok


def triangulate_two_views(line2d_1, Twc1_R, Twc1_t, line2d_2, Twc2_R, Twc2_t, intr,
                          min_angle_cos: float = 1.0):
    """Two-view plane-intersection triangulation (line_processor.cc:275-310).

    Each observation back-projects to a plane through the camera center; the
    3D line is the plane intersection, expressed in world Plücker (w, d).
    Returns (line_w (…, 6), degenerate mask where planes are near-parallel).
    """
    def plane_from_obs(line2d):
        p1 = intr.back_project_mono(line2d[..., 0:2])
        p2 = intr.back_project_mono(line2d[..., 2:4])
        n = jnp.cross(p1, p2)
        n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        return n  # plane through origin: n·x = 0 in that camera frame

    # plane 1 in camera-1 frame: (n1, 0)
    n1 = plane_from_obs(line2d_1)
    # camera 2 expressed in camera-1 frame
    R12 = jnp.swapaxes(Twc1_R, -1, -2) @ Twc2_R
    t12 = jnp.einsum("...ij,...j->...i", jnp.swapaxes(Twc1_R, -1, -2), Twc2_t - Twc1_t)
    n2_c2 = plane_from_obs(line2d_2)
    n2 = jnp.einsum("...ij,...j->...i", R12, n2_c2)
    d2 = -jnp.einsum("...i,...i->...", n2, t12)  # plane 2: n2·x + d2 = 0

    cos_theta = jnp.abs(jnp.einsum("...i,...i->...", n1, n2))
    # Plücker from two planes pi1 = (n1, d1=0), pi2 = (n2, d2): direction
    # d = n1×n2 and moment w = p×d = d1·n2 − d2·n1 (here d1 = 0).
    d = jnp.cross(n1, n2)
    w = -d2[..., None] * n1
    line_c1 = lie.line_normalize(jnp.concatenate([w, d], axis=-1))
    line_w = lie.line_transform(Twc1_R, Twc1_t, line_c1)
    degenerate = cos_theta > min_angle_cos - 1e-12
    return lie.line_normalize(line_w), degenerate


def point_2d_to_3d(anchor_3d1, anchor_3d2, anchor_2d1, anchor_2d2, p2d):
    """Linear interpolation of a 2D point between two anchor correspondences
    onto the 3D segment (``Point2DTo3D``, line_processor.cc:328-338): uses the
    dominant image axis of the anchor segment for the interpolation ratio."""
    d2d = anchor_2d2 - anchor_2d1
    use_x = jnp.abs(d2d[..., 0]) > jnp.abs(d2d[..., 1])
    md = jnp.where(use_x, 0, 1)
    num = jnp.take_along_axis(p2d - anchor_2d1, md[..., None], axis=-1)[..., 0]
    den = jnp.take_along_axis(d2d, md[..., None], axis=-1)[..., 0]
    rate = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    return anchor_3d1 + rate[..., None] * (anchor_3d2 - anchor_3d1)


def endpoint_trim(line3d_w, obs_lines_2d, Rcw, tcw, intr):
    """Project 2D endpoint observations onto a 3D line to get world endpoints
    (the role of ``Point2DTo3D``/endpoint maintenance, map.cc:192-340):
    back-project each observed endpoint ray and take the closest point on the
    3D line."""
    cart = lie.line_to_cartesian(line3d_w)
    p0, dvec = cart[..., 0:3], cart[..., 3:6]

    def closest_on_line(uv):
        ray_c = intr.back_project_mono(uv)
        Rwc = jnp.swapaxes(Rcw, -1, -2)
        origin = -jnp.einsum("...ij,...j->...i", Rwc, tcw)
        ray_w = jnp.einsum("...ij,...j->...i", Rwc, ray_c)
        ray_w = ray_w / jnp.clip(jnp.linalg.norm(ray_w, axis=-1, keepdims=True), 1e-12)
        # closest point on (p0, d) to the ray (origin, ray_w)
        # solve [d, -ray]ᵀ[d, -ray] [s, t]ᵀ = [d, -ray]ᵀ (origin - p0)
        w0 = origin - p0
        a = jnp.einsum("...i,...i->...", dvec, dvec)
        bq = jnp.einsum("...i,...i->...", dvec, ray_w)
        cq = jnp.einsum("...i,...i->...", ray_w, ray_w)
        dq = jnp.einsum("...i,...i->...", dvec, w0)
        eq = jnp.einsum("...i,...i->...", ray_w, w0)
        denom = a * cq - bq * bq
        s = jnp.where(jnp.abs(denom) < 1e-12, 0.0, (dq * cq - bq * eq) / denom)
        return p0 + s[..., None] * dvec

    e1 = closest_on_line(obs_lines_2d[..., 0:2])
    e2 = closest_on_line(obs_lines_2d[..., 2:4])
    return jnp.concatenate([e1, e2], axis=-1)


def endpoint_trim_np(line3d_w, obs_lines_2d, Rcw, tcw, fx, fy, cx, cy):
    """Pure-numpy twin of :func:`endpoint_trim`, vectorized over N
    observations — the HOST path of keyframe endpoint maintenance.

    The eager-jnp version dispatches ~50 tiny ops per observation; on the
    map-maintenance host path (Map.update_mapline_endpoints, called for every
    window line after each local BA) that dominated keyframe insertion.
    Same math, same answers (tests/test_lines.py gates 1e-6 agreement).

    line3d_w (6,) Plücker (w, d); obs_lines_2d (N, 4); Rcw (N, 3, 3);
    tcw (N, 3). Returns (N, 6) world endpoints.
    """
    import numpy as np

    line = np.asarray(line3d_w, np.float64)
    w, d = line[0:3], line[3:6]
    nd = max(float(np.linalg.norm(d)), 1e-12)
    w, d = w / nd, d / nd
    p0 = np.cross(d, w)
    n = np.asarray(obs_lines_2d).shape[0]
    return endpoint_trim_rows_np(
        np.broadcast_to(p0, (n, 3)), np.broadcast_to(d, (n, 3)),
        obs_lines_2d, Rcw, tcw, fx, fy, cx, cy)


def endpoint_trim_rows_np(p0, dvec, obs_lines_2d, Rcw, tcw, fx, fy, cx, cy):
    """Row-batched numpy endpoint trim: each row carries ITS OWN line
    (p0 (N, 3), dvec (N, 3) unit) and observation/camera — lets
    Map.update_maplines_endpoints_batch trim every (line, observer) pair of
    a BA window in one pass. Same math as :func:`endpoint_trim`."""
    import numpy as np

    p0 = np.asarray(p0, np.float64)
    dvec = np.asarray(dvec, np.float64)
    obs = np.asarray(obs_lines_2d, np.float64)
    Rwc = np.swapaxes(np.asarray(Rcw, np.float64), -1, -2)
    origin = -np.einsum("nij,nj->ni", Rwc, np.asarray(tcw, np.float64))

    def closest(uv):
        ray_c = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
                          np.ones(len(uv))], axis=-1)
        ray_w = np.einsum("nij,nj->ni", Rwc, ray_c)
        ray_w /= np.clip(np.linalg.norm(ray_w, axis=-1, keepdims=True),
                         1e-12, None)
        w0 = origin - p0
        a = np.einsum("ni,ni->n", dvec, dvec)
        bq = np.einsum("ni,ni->n", ray_w, dvec)
        cq = np.einsum("ni,ni->n", ray_w, ray_w)
        dq = np.einsum("ni,ni->n", w0, dvec)
        eq = np.einsum("ni,ni->n", ray_w, w0)
        denom = a * cq - bq * bq
        s = np.where(np.abs(denom) < 1e-12, 0.0,
                     (dq * cq - bq * eq) / np.where(np.abs(denom) < 1e-12,
                                                    1.0, denom))
        return p0 + s[:, None] * dvec

    return np.concatenate([closest(obs[:, 0:2]), closest(obs[:, 2:4])],
                          axis=-1)
