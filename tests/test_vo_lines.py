"""VO pipeline with LINES in the loop: synthetic 3D segments carrying
on-line points exercise point-line association, vote-matrix stereo/temporal
line matching, stereo line triangulation, mapline creation and line terms in
the sliding-window BA."""

import numpy as np
import pytest

from airslam_tpu.frontend.detector import FrameFeatures
from airslam_tpu.pipelines.map_builder import MapBuilder, KeyframeConfig, INIT_TWC
from airslam_tpu.slam.landmarks import LandmarkType
from tests.test_vo_pipeline import FakeCamera, FakeMatcher

K_BUDGET = 160
L_BUDGET = 16


def make_line_world(seed=0):
    """6 steep 3D segments with 12 points sampled on each + 100 background
    points; unique descriptors per point."""
    rng = np.random.RandomState(seed)
    segments = []
    for i in range(6):
        p1 = np.array([rng.uniform(-2, 2), rng.uniform(-1.5, 0.0), rng.uniform(4, 7)])
        d = np.array([rng.uniform(-0.3, 0.3), rng.uniform(1.2, 2.0), rng.uniform(-0.3, 0.3)])
        segments.append((p1, p1 + d))  # mostly vertical → stereo-triangulable
    pts = []
    on_line_of = []
    for si, (a, b) in enumerate(segments):
        for t in np.linspace(0.05, 0.95, 12):
            pts.append(a + t * (b - a))
            on_line_of.append(si)
    for _ in range(100):
        pts.append(np.array([
            rng.uniform(-4, 4), rng.uniform(-3, 3), rng.uniform(3, 9)
        ]))
        on_line_of.append(-1)
    pts = np.asarray(pts)
    desc = rng.randn(len(pts), 256).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    return segments, pts, desc, np.asarray(on_line_of)


def render(segments, pts, desc, Twc, cam):
    Rwc, twc = Twc[:3, :3], Twc[:3, 3]

    def proj(p, right=False):
        pc = Rwc.T @ (p - twc)
        b = cam.bf / cam.fx if right else 0.0
        return np.array([(pc[0] - b) / pc[2] * cam.fx + cam.cx,
                         pc[1] / pc[2] * cam.fy + cam.cy]), pc[2]

    # points
    k = 0
    kp = np.zeros((K_BUDGET, 2), np.float32)
    kpr = np.zeros((K_BUDGET, 2), np.float32)
    dsc = np.zeros((K_BUDGET, 256), np.float32)
    mask = np.zeros(K_BUDGET, bool)
    for i, p in enumerate(pts):
        if k >= K_BUDGET:
            break
        (u, v), z = proj(p)
        (ur, _), _ = proj(p, right=True)
        if z > 0.5 and 5 <= u < 747 and 5 <= v < 475 and ur >= 0:
            kp[k] = [u, v]
            kpr[k] = [ur, v]
            dsc[k] = desc[i]
            mask[k] = True
            k += 1

    # lines
    l = 0
    lines = np.zeros((L_BUDGET, 4), np.float32)
    lines_r = np.zeros((L_BUDGET, 4), np.float32)
    lmask = np.zeros(L_BUDGET, bool)
    for a, b in segments:
        (u1, v1), z1 = proj(a)
        (u2, v2), z2 = proj(b)
        (u1r, _), _ = proj(a, right=True)
        (u2r, _), _ = proj(b, right=True)
        if min(z1, z2) > 0.5 and all(5 <= x < 747 for x in (u1, u2)) and all(
            5 <= y < 475 for y in (v1, v2)
        ):
            lines[l] = [u1, v1, u2, v2]
            lines_r[l] = [u1r, v1, u2r, v2]
            lmask[l] = True
            l += 1

    feats_l = FrameFeatures(
        keypoints=kp, kp_scores=mask.astype(np.float32), kp_desc=dsc, kp_mask=mask,
        lines=lines, line_scores=lmask.astype(np.float32), line_mask=lmask,
        junctions=np.zeros((8, 2), np.float32), junc_scores=np.zeros(8, np.float32),
        junc_desc=np.zeros((8, 256), np.float32), junc_mask=np.zeros(8, bool),
    )
    feats_r = feats_l._replace(keypoints=kpr, lines=lines_r)
    idx = np.nonzero(mask)[0]
    pairs = np.stack([idx, idx], -1).astype(np.int32)
    return feats_l, feats_r, pairs


@pytest.fixture(scope="module")
def vo_with_lines():
    cam = FakeCamera()
    builder = MapBuilder(
        cam, detector=None, matcher=FakeMatcher(),
        kf_config=KeyframeConfig(min_init_stereo_feature=50, max_num_match=500,
                                 tracking_point_rate=2.0),  # keyframe every frame
    )
    segments, pts, desc, _ = make_line_world()
    for i in range(8):
        T = np.eye(4)
        T[:3, 3] = [0.05 * i, 0.01 * i, 0.1 * i]
        fl, fr, pairs = render(segments, pts, desc, T, cam)
        builder.track_features(i * 0.1, fl, fr, pairs)
    return builder, segments


def test_lines_tracked_and_mapped(vo_with_lines):
    builder, segments = vo_with_lines
    m = builder.map
    good = [l for l in m.maplines.values() if l.is_valid]
    assert len(good) >= 4, f"only {len(good)} valid maplines"
    # each valid line observed from multiple keyframes (temporal matching)
    assert max(len(l.observers) for l in good) >= 3


def test_mapline_geometry(vo_with_lines):
    builder, segments = vo_with_lines
    from airslam_tpu.core import lie
    import jax.numpy as jnp

    m = builder.map
    A = INIT_TWC  # gt frame 0 == identity, so map world = INIT_TWC · world
    errs = []
    for mpl in m.maplines.values():
        if not mpl.is_valid or not mpl.endpoints_valid:
            continue
        # distance of the mapline to its best-matching gt segment
        best = np.inf
        for a, b in segments:
            ga = A[:3, :3] @ a + A[:3, 3]
            gb = A[:3, :3] @ b + A[:3, 3]
            d1 = float(lie.line_point_distance(jnp.asarray(mpl.line3d), jnp.asarray(ga)))
            d2 = float(lie.line_point_distance(jnp.asarray(mpl.line3d), jnp.asarray(gb)))
            best = min(best, max(d1, d2))
        errs.append(best)
    assert len(errs) >= 4
    assert np.median(errs) < 0.05, f"line errors {errs}"


def test_line_inliers_in_ba(vo_with_lines):
    builder, _ = vo_with_lines
    m = builder.map
    # lines survived the chi² gating in local BA (observers kept)
    survivors = [l for l in m.maplines.values() if l.is_valid and len(l.observers) >= 2]
    assert len(survivors) >= 4
    m.check_map()
