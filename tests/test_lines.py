import numpy as np
import jax.numpy as jnp

from airslam_tpu.core import lie
from airslam_tpu.frontend import lines as lp
from tests.synthetic import default_intrinsics


def test_point_line_relation():
    lines = jnp.asarray([[10.0, 10.0, 110.0, 10.0]])  # horizontal segment
    lmask = jnp.ones(1, bool)
    kpts = jnp.asarray([
        [50.0, 11.0],   # on the line (1 px off)
        [50.0, 20.0],   # 10 px away
        [150.0, 10.0],  # on infinite line but past the endpoint
        [112.0, 11.0],  # within 3 px of endpoint ball
    ])
    kmask = jnp.ones(4, bool)
    rel, dist = lp.point_line_relation(lines, lmask, kpts, kmask)
    assert np.asarray(rel)[0].tolist() == [True, False, False, True]
    assert abs(float(dist[0, 0]) - 1.0) < 1e-9


def test_match_lines_by_points():
    # two lines in each image; points 0-3 on line0, 4-6 on line1 (image 0)
    rel0 = np.zeros((2, 8), bool)
    rel0[0, 0:4] = True
    rel0[1, 4:7] = True
    rel1 = np.zeros((3, 8), bool)
    rel1[1, 0:4] = True   # image-1 line 1 holds matches of line 0's points
    rel1[2, 4:7] = True
    # point i in image0 matches point i in image1
    idx = np.arange(8, dtype=np.int32)
    msk = np.ones(8, bool)
    out = np.asarray(lp.match_lines_by_points(jnp.asarray(rel0), jnp.asarray(rel1),
                                              jnp.asarray(idx), jnp.asarray(msk)))
    assert out.tolist() == [1, 2]


def test_match_lines_requires_min_votes_and_score():
    rel0 = np.zeros((1, 8), bool)
    rel0[0, 0:6] = True
    rel1 = np.zeros((1, 8), bool)
    rel1[0, 0:6] = True
    idx = np.arange(8, dtype=np.int32)
    # only one shared match → below min_votes
    msk = np.zeros(8, bool)
    msk[0] = True
    out = np.asarray(lp.match_lines_by_points(jnp.asarray(rel0), jnp.asarray(rel1),
                                              jnp.asarray(idx), jnp.asarray(msk)))
    assert out.tolist() == [-1]
    # two matches of 6 points: score = 4/6 < 0.8 → rejected
    msk[1] = True
    out = np.asarray(lp.match_lines_by_points(jnp.asarray(rel0), jnp.asarray(rel1),
                                              jnp.asarray(idx), jnp.asarray(msk)))
    assert out.tolist() == [-1]
    # three matches: 9/6 = 1.5 ≥ 0.8 → accepted
    msk[2] = True
    out = np.asarray(lp.match_lines_by_points(jnp.asarray(rel0), jnp.asarray(rel1),
                                              jnp.asarray(idx), jnp.asarray(msk)))
    assert out.tolist() == [0]


def _project_segment(p1, p2, intr, right=False):
    b = float(intr.bf) / float(intr.fx) if right else 0.0
    out = []
    for p in (p1, p2):
        q = p - np.array([b, 0, 0])
        out += [q[0] / q[2] * float(intr.fx) + float(intr.cx),
                q[1] / q[2] * float(intr.fy) + float(intr.cy)]
    return np.array(out)


def test_triangulate_stereo_lines_roundtrip():
    intr = default_intrinsics()
    p1 = np.array([0.3, -0.8, 5.0])
    p2 = np.array([0.6, 0.9, 5.5])  # steep (non-horizontal) line
    seg_l = _project_segment(p1, p2, intr)
    seg_r = _project_segment(p1, p2, intr, right=True)
    ends, ok = lp.triangulate_stereo_lines(
        jnp.asarray(seg_l[None]), jnp.asarray(seg_r[None]), jnp.ones(1, bool),
        jnp.eye(3), jnp.zeros(3), intr, 45.0 / 10.0, 45.0 / 0.1,
    )
    assert bool(ok[0])
    assert np.allclose(np.asarray(ends[0, 0:3]), p1, atol=1e-8)
    assert np.allclose(np.asarray(ends[0, 3:6]), p2, atol=1e-8)


def test_triangulate_stereo_rejects_horizontal():
    intr = default_intrinsics()
    p1 = np.array([-1.0, 0.5, 5.0])
    p2 = np.array([1.0, 0.52, 5.0])  # nearly horizontal
    seg_l = _project_segment(p1, p2, intr)
    seg_r = _project_segment(p1, p2, intr, right=True)
    _, ok = lp.triangulate_stereo_lines(
        jnp.asarray(seg_l[None]), jnp.asarray(seg_r[None]), jnp.ones(1, bool),
        jnp.eye(3), jnp.zeros(3), intr, 0.1, 500.0,
    )
    assert not bool(ok[0])


def test_triangulate_two_views():
    intr = default_intrinsics()
    p1 = np.array([0.4, -0.6, 6.0])
    p2 = np.array([-0.5, 0.8, 7.0])
    # camera 1 at origin; camera 2 translated
    R2 = np.eye(3)
    t2 = np.array([0.5, 0.1, 0.0])

    def proj(p, R, t):
        pc = R.T @ (p - t)
        return np.array([pc[0] / pc[2] * 450 + 376, pc[1] / pc[2] * 450 + 240])

    obs1 = np.concatenate([proj(p1, np.eye(3), np.zeros(3)), proj(p2, np.eye(3), np.zeros(3))])
    obs2 = np.concatenate([proj(p1, R2, t2), proj(p2, R2, t2)])
    line_w, degen = lp.triangulate_two_views(
        jnp.asarray(obs1), jnp.eye(3), jnp.zeros(3),
        jnp.asarray(obs2), jnp.asarray(R2), jnp.asarray(t2), intr,
    )
    assert not bool(degen)
    assert float(lie.line_point_distance(line_w, jnp.asarray(p1))) < 1e-6
    assert float(lie.line_point_distance(line_w, jnp.asarray(p2))) < 1e-6


def test_endpoint_trim():
    intr = default_intrinsics()
    p1 = np.array([0.4, -0.6, 6.0])
    p2 = np.array([-0.5, 0.8, 7.0])
    line_w = lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))

    def proj(p):
        return np.array([p[0] / p[2] * 450 + 376, p[1] / p[2] * 450 + 240])

    obs = jnp.asarray(np.concatenate([proj(p1), proj(p2)]))
    ends = lp.endpoint_trim(line_w, obs, jnp.eye(3), jnp.zeros(3), intr)
    assert np.allclose(np.asarray(ends[0:3]), p1, atol=1e-6)
    assert np.allclose(np.asarray(ends[3:6]), p2, atol=1e-6)


def test_endpoint_trim_np_matches_jax():
    """The numpy host twin (Map.update_mapline_endpoints path) agrees with
    the jax endpoint_trim on random rigs to 1e-6."""
    intr = default_intrinsics()
    rng = np.random.RandomState(7)
    p1 = np.array([0.4, -0.6, 6.0])
    p2 = np.array([-0.5, 0.8, 7.0])
    line_w = lie.line_from_endpoints(jnp.asarray(p1), jnp.asarray(p2))

    N = 5
    obs = rng.rand(N, 4) * 400 + 100
    Rcw = np.stack([np.linalg.qr(rng.randn(3, 3))[0] for _ in range(N)])
    Rcw *= np.sign(np.linalg.det(Rcw))[:, None, None]
    tcw = rng.randn(N, 3) * 0.3

    ref = np.stack([
        np.asarray(lp.endpoint_trim(line_w, jnp.asarray(obs[i]),
                                    jnp.asarray(Rcw[i]), jnp.asarray(tcw[i]),
                                    intr))
        for i in range(N)
    ])
    got = lp.endpoint_trim_np(np.asarray(line_w), obs, Rcw, tcw,
                              450.0, 450.0, 376.0, 240.0)
    assert np.allclose(got, ref, atol=1e-6), np.abs(got - ref).max()


def test_point_2d_to_3d():
    a3d1 = jnp.asarray([0.0, 0.0, 4.0])
    a3d2 = jnp.asarray([2.0, 0.0, 6.0])
    a2d1 = jnp.asarray([100.0, 200.0])
    a2d2 = jnp.asarray([300.0, 210.0])  # x-dominant
    p2d = jnp.asarray([200.0, 205.0])  # halfway in x
    p3d = lp.point_2d_to_3d(a3d1, a3d2, a2d1, a2d2, p2d)
    assert np.allclose(np.asarray(p3d), [1.0, 0.0, 5.0])
