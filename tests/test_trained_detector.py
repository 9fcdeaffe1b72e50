"""Trained-weights detector quality (VERDICT r1 #3 'make the detector see').

Runs only when the synthetic-shapes-trained checkpoint
(airslam_tpu/checkpoints/plnet_s0.npz, produced by apps/train_plnet.py) is
present. The stage-1 LOI head weights are the reference's shipped checkpoint
import (always present in-repo)."""

import os

import numpy as np
import pytest

from airslam_tpu.models import weights as wio

CKPT = wio.checkpoint_path("plnet_s0.npz")
pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="trained plnet_s0 checkpoint absent")


@pytest.fixture(scope="module")
def detector():
    from airslam_tpu.frontend.detector import DetectorConfig, FeatureDetector

    p = wio.load_params(CKPT)
    return FeatureDetector(
        DetectorConfig(use_superpoint=False),
        params={"plnet": p["plnet"], "loi": p["loi"]},
    )


def _single(feats):
    import jax.tree_util as jtu

    return jtu.tree_map(lambda t: np.asarray(t[0]), feats)


def test_checkerboard_corners(detector):
    """≥100 repeatable corners on a rendered checkerboard, localized within
    3 px of the true crossings (the de-facto test_feature harness,
    demo/test_feature.cpp:16)."""
    H, W, sq = 480, 752, 48
    img = np.zeros((H, W), np.float32)
    for r in range(0, H, sq):
        for c in range(0, W, sq):
            img[r:r + sq, c:c + sq] = 0.85 if ((r // sq) + (c // sq)) % 2 == 0 else 0.25
    f = _single(detector.detect(img[None], detect_junctions=True))
    kp = f.keypoints[f.kp_mask]
    assert len(kp) >= 100
    gx = np.arange(sq, W - 1, sq)
    gy = np.arange(sq, H - 1, sq)
    crossings = np.asarray([(x, y) for x in gx for y in gy], float)
    d = np.linalg.norm(kp[:, None] - crossings[None], axis=-1).min(axis=1)
    assert (d < 3.0).sum() >= 100
    # a sizable share of interior crossings found (checkerboards are out of
    # the synthetic-shapes training distribution; 400-kpt budget for 135
    # crossings plus their duplicates)
    dc = np.linalg.norm(crossings[:, None] - kp[None], axis=-1).min(axis=1)
    assert (dc < 3.0).mean() > 0.3


def test_synthetic_scene_corners_and_lines(detector):
    """On the training distribution (held-out seed): corners recall >70%
    within 3 px; detected line segments recover a usable share of the GT
    wireframe."""
    import jax

    from airslam_tpu.frontend import synthgen

    recs, precs = [], []
    for seed in (123, 7, 99):
        s = jax.jit(synthgen.render_scene)(jax.random.PRNGKey(seed))
        img = np.asarray(s.image)
        f = _single(detector.detect(img[None], detect_junctions=True))
        gt_c = np.asarray(s.corners)[np.asarray(s.corner_mask)]
        kp = f.keypoints[f.kp_mask]
        dc = np.linalg.norm(gt_c[:, None] - kp[None], axis=-1).min(axis=1)
        assert (dc < 3.0).mean() > 0.7, f"seed {seed} corner recall"

        gt_seg = np.asarray(s.segments)[np.asarray(s.segment_mask)]
        lines = f.lines[f.line_mask]

        def seg_d(a, b):
            d1 = np.linalg.norm(a[:2] - b[:2]) + np.linalg.norm(a[2:] - b[2:])
            d2 = np.linalg.norm(a[:2] - b[2:]) + np.linalg.norm(a[2:] - b[:2])
            return min(d1, d2) / 2

        def pt_seg_dist(pt, seg):
            a, b = seg[:2], seg[2:]
            d = b - a
            t = np.clip((pt - a) @ d / max(d @ d, 1e-9), 0, 1)
            return np.linalg.norm(pt - (a + t * d))

        # recall: GT segment recovered with both endpoints (within 10 px)
        rec = sum(min((seg_d(g, l) for l in lines), default=1e9) < 10 for g in gt_seg)
        recs.append(rec / max(len(gt_seg), 1))
        # precision: a detection is true if it LIES ON some GT segment (the
        # detector may split long segments at crossings — still valid lines)
        if len(lines):
            on = sum(
                any(pt_seg_dist(l[:2], g) < 4 and pt_seg_dist(l[2:], g) < 4
                    for g in gt_seg)
                for l in lines
            )
            precs.append(on / len(lines))
    assert np.mean(recs) > 0.7, f"line recall {recs}"
    assert np.mean(precs) > 0.7, f"line on-segment precision {precs}"


def test_trained_matcher_on_detected_features(detector):
    """Trained LightGlue on trained-detector features: every accepted match
    must be geometrically correct under the known affine view change."""
    import jax
    import jax.tree_util as jtu

    mckpt = wio.checkpoint_path("lightglue.npz")
    if not os.path.exists(mckpt):
        pytest.skip("trained lightglue checkpoint absent")
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher

    pm = PointMatcher(
        MatcherConfig(matcher=0, max_keypoints=400, image_width=512, image_height=512),
        params=wio.load_params(mckpt),
    )
    key = jax.random.PRNGKey(42)
    _, k2, _, _ = jax.random.split(key, 4)  # render_pair's affine key
    A, t = synthgen.random_affine(k2, 512)
    A, t = np.asarray(A), np.asarray(t)
    s0, s1 = synthgen.render_pair(key)
    f0 = jtu.tree_map(lambda x: np.asarray(x[0]), detector.detect(np.asarray(s0.image)[None]))
    f1 = jtu.tree_map(lambda x: np.asarray(x[0]), detector.detect(np.asarray(s1.image)[None]))
    pairs, _ = pm.matching_points(f0, f1)
    assert len(pairs) >= 25
    pred = f0.keypoints[pairs[:, 0]] @ A.T + t
    err = np.linalg.norm(pred - f1.keypoints[pairs[:, 1]], axis=-1)
    assert (err < 4.0).mean() > 0.9, f"{(err < 4.0).sum()}/{len(pairs)}"


def test_trained_superglue_on_detected_features(detector):
    """Trained SuperGlue (matcher: 1, Sinkhorn OT) on trained-detector
    features: accepted matches must be geometrically correct under the known
    affine view change (super_glue.cpp:339-367 decode semantics)."""
    import jax
    import jax.tree_util as jtu

    mckpt = wio.checkpoint_path("superglue.npz")
    if not os.path.exists(mckpt):
        pytest.skip("trained superglue checkpoint absent")
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher
    from airslam_tpu.models.superglue import SG_SINKHORN_ITERS

    pm = PointMatcher(
        MatcherConfig(matcher=1, max_keypoints=400, image_width=512,
                      image_height=512, sinkhorn_iterations=SG_SINKHORN_ITERS),
        params=wio.load_params(mckpt),
    )
    key = jax.random.PRNGKey(42)
    _, k2, _, _ = jax.random.split(key, 4)  # render_pair's affine key
    A, t = synthgen.random_affine(k2, 512)
    A, t = np.asarray(A), np.asarray(t)
    s0, s1 = synthgen.render_pair(key)
    f0 = jtu.tree_map(lambda x: np.asarray(x[0]), detector.detect(np.asarray(s0.image)[None]))
    f1 = jtu.tree_map(lambda x: np.asarray(x[0]), detector.detect(np.asarray(s1.image)[None]))
    pairs, _ = pm.matching_points(f0, f1)
    assert len(pairs) >= 25
    pred = f0.keypoints[pairs[:, 0]] @ A.T + t
    err = np.linalg.norm(pred - f1.keypoints[pairs[:, 1]], axis=-1)
    assert (err < 4.0).mean() > 0.9, f"{(err < 4.0).sum()}/{len(pairs)}"


def test_descriptors_match_across_views(detector):
    """Descriptors of the same 3D corners match across an affine view change
    (mutual nearest neighbors mostly correct)."""
    import jax

    from airslam_tpu.frontend import synthgen
    from airslam_tpu.ops.gridsample import sample_descriptors

    s0, s1 = synthgen.render_pair(jax.random.PRNGKey(5))
    f0 = _single(detector.detect(np.asarray(s0.image)[None]))
    f1 = _single(detector.detect(np.asarray(s1.image)[None]))
    import jax.numpy as jnp

    m = np.asarray(s0.corner_mask) & np.asarray(s1.corner_mask)
    c0 = np.asarray(s0.corners)[m]
    c1 = np.asarray(s1.corners)[m]
    # sample the detector's descriptor maps at the GT corner tracks
    out0 = detector.plnet.apply(detector.params["plnet"],
                                jnp.asarray(s0.image)[None, ..., None])
    out1 = detector.plnet.apply(detector.params["plnet"],
                                jnp.asarray(s1.image)[None, ..., None])
    d0 = np.asarray(sample_descriptors(
        jnp.asarray(out0["descriptors"][0]).transpose(2, 0, 1), jnp.asarray(c0), 8))
    d1 = np.asarray(sample_descriptors(
        jnp.asarray(out1["descriptors"][0]).transpose(2, 0, 1), jnp.asarray(c1), 8))
    sim = d0 @ d1.T
    fwd = sim.argmax(1)
    bwd = sim.argmax(0)
    n = len(c0)
    mutual_correct = sum(1 for i in range(n) if fwd[i] == i and bwd[i] == i)
    assert mutual_correct / n > 0.6, f"{mutual_correct}/{n}"


def test_trained_superpoint_corners():
    """The standalone SuperPoint checkpoint (use_superpoint: 1 path) recalls
    synthetic-scene corners."""
    import jax
    import jax.numpy as jnp

    ckpt = wio.checkpoint_path("superpoint.npz")
    if not os.path.exists(ckpt):
        pytest.skip("trained superpoint checkpoint absent")
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.models.superpoint import SuperPoint
    from airslam_tpu.ops.detect import topk_keypoints

    sp = SuperPoint()
    p = wio.load_params(ckpt)
    s = jax.jit(synthgen.render_scene)(jax.random.PRNGKey(55))
    out = sp.apply(p, np.asarray(s.image)[None, ..., None])
    kps = topk_keypoints(jnp.asarray(out["scores"][0]), 0.004, 4, 400)
    kp = np.asarray(kps.xy)[np.asarray(kps.mask)]
    gt = np.asarray(s.corners)[np.asarray(s.corner_mask)]
    d = np.linalg.norm(gt[:, None] - kp[None], axis=-1).min(axis=1)
    assert (d < 3.0).mean() > 0.7

def test_illumination_repeatability(detector):
    """Detector repeatability across a 4x brightness ratio (the dark-EuRoC
    condition): the same scene rendered bright and gamma-crushed dark must
    yield >=60% repeated keypoints (3 px) and cross-matching descriptors.
    This is the training-side gate for the photometric augmentation
    (synthgen.photometric_augment)."""
    import jax
    import jax.numpy as jnp

    from airslam_tpu.frontend import synthgen

    reps, mutuals = [], []
    for seed in (11, 29):
        s = jax.jit(synthgen.render_scene)(jax.random.PRNGKey(seed))
        img = np.asarray(s.image)
        dark = np.asarray(synthgen.dark_transform(
            jax.random.PRNGKey(seed + 1), jnp.asarray(img), level=0.25))
        assert dark.mean() < img.mean() / 3.5  # genuinely ~4x darker

        fb = _single(detector.detect(img[None], detect_junctions=False))
        fd = _single(detector.detect(dark[None], detect_junctions=False))
        kb = fb.keypoints[fb.kp_mask]
        kd = fd.keypoints[fd.kp_mask]
        assert len(kd) >= 50, f"only {len(kd)} keypoints in the dark render"
        d = np.linalg.norm(kb[:, None] - kd[None], axis=-1).min(axis=1)
        reps.append((d < 3.0).mean())

        # descriptor bridge: mutual nearest neighbors across the brightness
        # gap must be geometrically consistent (identity geometry here)
        db = fb.kp_desc[fb.kp_mask]
        dd = fd.kp_desc[fd.kp_mask]
        sim = db @ dd.T
        fwd = sim.argmax(1)
        bwd = sim.argmax(0)
        good = 0
        tot = 0
        for i in range(len(kb)):
            j = fwd[i]
            if bwd[j] != i:
                continue
            tot += 1
            if np.linalg.norm(kb[i] - kd[j]) < 3.0:
                good += 1
        mutuals.append(good / max(tot, 1))
    assert np.mean(reps) > 0.6, f"bright->dark repeatability {reps}"
    assert np.mean(mutuals) > 0.8, f"cross-illumination match precision {mutuals}"


def test_wide_viewpoint_matching(detector):
    """Matcher gate at 2x the training affine range (the relocalization
    viewpoint-envelope condition): the viewpoint-curriculum fine-tuned
    LightGlue (apps/train_matcher.py --view 2) must keep accepting a
    healthy match count at wide baselines without losing precision.
    Pre-curriculum weights measured ~80 accepted matches here; the gate
    pins the fine-tune's count recovery (map_user.cc:360-457 is the
    consumer — reloc PnP needs the raw count)."""
    import jax
    import jax.tree_util as jtu

    mckpt = wio.checkpoint_path("lightglue.npz")
    if not os.path.exists(mckpt):
        pytest.skip("trained lightglue checkpoint absent")
    from airslam_tpu.frontend import synthgen
    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher

    pm = PointMatcher(
        MatcherConfig(matcher=0, max_keypoints=400, image_width=512,
                      image_height=512),
        params=wio.load_params(mckpt),
    )
    v = 2.0  # fixed affine strength multiplier (rotation/scale/shift x2)
    counts, precs = [], []
    for seed in (1000, 1002, 1004):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        shapes = synthgen.sample_shapes(k1, 512)
        A, t = synthgen.random_affine(
            k2, 512, max_rot=0.35 * v,
            scale_range=(1.0 - 0.15 * v, 1.0 + 0.15 * v), max_shift=40.0 * v)
        s0 = synthgen.render_from_shapes(k3, shapes, 512)
        s1 = synthgen.render_from_shapes(
            k4, synthgen.warp_shapes(shapes, A, t), 512)
        A, t = np.asarray(A), np.asarray(t)
        f0 = jtu.tree_map(lambda x: np.asarray(x[0]),
                          detector.detect(np.asarray(s0.image)[None]))
        f1 = jtu.tree_map(lambda x: np.asarray(x[0]),
                          detector.detect(np.asarray(s1.image)[None]))
        pairs, _ = pm.matching_points(f0, f1)
        counts.append(len(pairs))
        if len(pairs):
            pred = f0.keypoints[pairs[:, 0]] @ A.T + t
            err = np.linalg.norm(pred - f1.keypoints[pairs[:, 1]], axis=-1)
            precs.append((err < 4.0).mean())
    assert np.mean(counts) >= 60, f"wide-viewpoint match counts {counts}"
    assert np.mean(precs) > 0.9, f"wide-viewpoint precision {precs}"


def test_real_photo_detections(detector):
    """Natural-image smoke gate (container has no EuRoC): the trained
    detector must produce plentiful, spatially-spread, non-degenerate
    detections on real photographs (data/photos/, license-free), stable
    under a brightness change."""
    import cv2

    photo_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "photos")
    photos = [f for f in sorted(os.listdir(photo_dir)) if f.endswith(".jpg")]
    assert len(photos) >= 3
    for name in photos:
        img = cv2.imread(os.path.join(photo_dir, name), cv2.IMREAD_GRAYSCALE)
        img = img.astype(np.float32) / 255.0
        f = _single(detector.detect(img[None], detect_junctions=True))
        kp = f.keypoints[f.kp_mask]
        assert len(kp) >= 100, f"{name}: only {len(kp)} keypoints"
        # spread across the frame, not collapsed onto one structure
        assert kp[:, 0].std() > img.shape[1] * 0.1, name
        assert kp[:, 1].std() > img.shape[0] * 0.1, name
        # descriptors are non-degenerate (not all pointing one way)
        d = f.kp_desc[f.kp_mask]
        off = (d @ d.T)[~np.eye(len(d), dtype=bool)]
        assert off.mean() < 0.9, f"{name}: descriptor collapse {off.mean():.3f}"

        # stability under a 0.7x brightness change: most keypoints repeat
        f2 = _single(detector.detect((img * 0.7)[None], detect_junctions=True))
        kp2 = f2.keypoints[f2.kp_mask]
        dmin = np.linalg.norm(kp[:, None] - kp2[None], axis=-1).min(axis=1)
        assert (dmin < 3.0).mean() > 0.5, f"{name}: {(dmin < 3.0).mean():.2f}"


def _load_photos_512():
    import cv2

    photo_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "photos")
    out = []
    for name in sorted(os.listdir(photo_dir)):
        if not name.endswith(".jpg"):
            continue
        img = cv2.imread(os.path.join(photo_dir, name), cv2.IMREAD_GRAYSCALE)
        img = cv2.resize(img, (512, 512), interpolation=cv2.INTER_AREA)
        out.append((name, img.astype(np.float32) / 255.0))
    return out


def _photo_homography(seed: int):
    """A mild perspective view change of EuRoC-frame magnitude: rotation
    ~0.15 rad, scale ~1.08, shift, small projective terms."""
    rng = np.random.RandomState(seed)
    th = rng.uniform(-0.15, 0.15)
    s = rng.uniform(0.95, 1.08)
    c, sn = np.cos(th) * s, np.sin(th) * s
    cx = cy = 256.0
    Hm = np.array([[c, -sn, cx - c * cx + sn * cy + rng.uniform(-15, 15)],
                   [sn, c, cy - sn * cx - c * cy + rng.uniform(-15, 15)],
                   [rng.uniform(-1, 1) * 8e-5, rng.uniform(-1, 1) * 8e-5, 1.0]])
    return Hm


def _match_photo_pair(detector, pm, img, Hm, photometric=False):
    """Warp -> detect both -> match; returns (n_matches, precision@4px)
    counting only matches whose true correspondence is in-frame."""
    import cv2
    import jax.tree_util as jtu

    img1 = cv2.warpPerspective(img, Hm, (512, 512),
                               flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_REPLICATE)
    if photometric:
        img1 = np.clip(img1 * 0.65, 0, 1) ** 1.3  # darken + gamma
    f0 = jtu.tree_map(lambda x: np.asarray(x[0]), detector.detect(img[None]))
    f1 = jtu.tree_map(lambda x: np.asarray(x[0]), detector.detect(img1[None]))
    pairs, _ = pm.matching_points(f0, f1)
    if len(pairs) == 0:
        return 0, 0.0
    p0 = f0.keypoints[pairs[:, 0]]
    ph = np.concatenate([p0, np.ones((len(p0), 1), np.float32)], -1) @ Hm.T
    pred = ph[:, :2] / ph[:, 2:3]
    inb = ((pred[:, 0] >= 0) & (pred[:, 0] < 512)
           & (pred[:, 1] >= 0) & (pred[:, 1] < 512))
    if inb.sum() == 0:
        return 0, 0.0
    err = np.linalg.norm(pred[inb] - f1.keypoints[pairs[inb, 1]], axis=-1)
    return int(inb.sum()), float((err < 4.0).mean())


def _real_photo_matching(detector, matcher_id):
    """Shared gate body: trained matcher on REAL texture (VERDICT r3 item 5)
    — homography-warped photo pairs give ground-truthed correspondences;
    thresholds within 2x of the synthetic-pair gates (>=25 matches, 0.9
    precision). Ref: /root/reference/src/light_glue.cpp:214-266 (decode
    thresholds tuned on real imagery)."""
    from airslam_tpu.frontend.matcher import MatcherConfig, PointMatcher
    from airslam_tpu.models.superglue import SG_SINKHORN_ITERS

    name = ("lightglue", "superglue")[matcher_id]
    mckpt = wio.checkpoint_path(f"{name}.npz")
    if not os.path.exists(mckpt):
        pytest.skip(f"trained {name} checkpoint absent")
    pm = PointMatcher(
        MatcherConfig(matcher=matcher_id, max_keypoints=400, image_width=512,
                      image_height=512, sinkhorn_iterations=SG_SINKHORN_ITERS),
        params=wio.load_params(mckpt),
    )
    photos = _load_photos_512()
    assert len(photos) >= 3
    counts, precs, pcounts, pprecs = [], [], [], []
    for i, (pname, img) in enumerate(photos):
        Hm = _photo_homography(100 + i)
        n, p = _match_photo_pair(detector, pm, img, Hm)
        counts.append(n), precs.append(p)
        # repeatability across the photometric transform (darken + gamma)
        n2, p2 = _match_photo_pair(detector, pm, img, Hm, photometric=True)
        pcounts.append(n2), pprecs.append(p2)
    assert np.mean(counts) >= 15, f"{name} photo match counts {counts}"
    assert np.mean(precs) > 0.75, f"{name} photo precision {precs}"
    assert np.mean(pcounts) >= 12, f"{name} photometric counts {pcounts}"
    assert np.mean(pprecs) > 0.7, f"{name} photometric precision {pprecs}"


def test_real_photo_matching_lightglue(detector):
    _real_photo_matching(detector, 0)


def test_real_photo_matching_superglue(detector):
    _real_photo_matching(detector, 1)
