"""Multi-chip tests on the virtual 8-device CPU mesh: sharded BA equals the
single-device result; the tensor/data-parallel training step runs."""

import numpy as np
import jax
import jax.numpy as jnp

from airslam_tpu.backend import windows
from airslam_tpu.parallel import mesh as pmesh
from airslam_tpu.parallel.sharded_ba import sharded_global_ba, shard_problem
from tests.synthetic import make_point_scene, build_problem


def test_mesh_construction():
    m = pmesh.make_mesh(8)
    assert m.shape == {"dp": 4, "tp": 2}
    m1 = pmesh.make_mesh(8, tp=1)
    assert m1.shape == {"dp": 8, "tp": 1}


def test_sharded_ba_matches_single_device():
    rng = np.random.RandomState(0)
    scene = make_point_scene(f=4, p=64, rng=rng)
    Rwb0 = scene["Rwb"].copy()
    twb0 = scene["twb"].copy()
    from scipy.spatial.transform import Rotation
    for i in range(1, 4):
        Rwb0[i] = Rwb0[i] @ Rotation.from_rotvec(rng.randn(3) * 0.02).as_matrix()
        twb0[i] = twb0[i] + rng.randn(3) * 0.05
    pts0 = scene["points"] + rng.randn(*scene["points"].shape) * 0.05

    prob = build_problem(scene, Rwb=Rwb0, twb=twb0, points=pts0)

    ref, p_in_ref, _ = windows.local_ba(prob, scene["intr"], iters1=3, iters2=5)

    mesh = pmesh.make_mesh(8, tp=1)
    out, p_in, _ = sharded_global_ba(
        prob, scene["intr"], __import__("airslam_tpu.backend.gn", fromlist=["BAConfig"]).BAConfig(),
        mesh, iters1=3, iters2=5,
    )
    assert np.allclose(np.asarray(out.frames.twb), np.asarray(ref.frames.twb), atol=1e-8)
    assert np.allclose(np.asarray(out.points), np.asarray(ref.points), atol=1e-8)
    assert np.array_equal(np.asarray(p_in), np.asarray(p_in_ref))
    # result still converged to ground truth
    assert np.abs(np.asarray(out.frames.twb) - scene["twb"]).max() < 1e-3


def test_training_step_on_mesh():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_dryrun_multichip_standalone():
    """Invoke dryrun_multichip exactly as the driver does: a fresh process
    with NO conftest platform setup (round-1 failure: MULTICHIP_r01 rc=1
    because the mesh assumed 8 devices already existed). The entry point must
    self-provision the virtual CPU mesh."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_AIRSLAM_MULTICHIP_INNER")
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "dryrun_multichip OK" in r.stdout
    # the driver records this tail verbatim: all five paths, warning-free
    for line in ("dryrun sparse-globalba OK", "dryrun window-ba OK",
                 "dryrun sharded-detect OK", "dryrun mesh-pipeline OK"):
        assert line in r.stdout, f"missing {line!r}: {r.stdout}"
    assert "UserWarning" not in r.stderr, f"polluted stderr: {r.stderr}"
    assert "truncated to dtype" not in r.stderr, r.stderr


def test_training_reduces_loss():
    import optax
    from airslam_tpu.models.lightglue import LightGlue
    from airslam_tpu.parallel import training

    model = LightGlue(dim=64, heads=4, layers=2)
    state, tx = training.init_train_state(model, n=16, lr=3e-4, seed=0)
    step = jax.jit(training.make_train_step(model, tx))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        batch = training.make_batch(jax.random.fold_in(key, i), batch=4, n=16)
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_sharded_detect_matches_single_device():
    """Frame-parallel frontend: detector.detect with the batch sharded over
    the full 8-device mesh must reproduce the single-device outputs (offline
    mapping / refinement re-detection at N-chip throughput)."""
    import numpy as np
    from airslam_tpu.frontend.detector import DetectorConfig, FeatureDetector
    from airslam_tpu.parallel import mesh as pmesh
    from airslam_tpu.parallel.frontend import sharded_detect

    cfg = DetectorConfig(max_keypoints=64, max_lines=32, max_proposals=512)
    det = FeatureDetector(cfg, seed=0)
    rng = np.random.RandomState(0)
    frames = rng.rand(3, 120, 188).astype(np.float32)  # pads 3 -> 8

    ref = det.detect(frames)
    m = pmesh.make_mesh(8)
    out = sharded_detect(det, frames, m)
    assert out.keypoints.shape == ref.keypoints.shape
    np.testing.assert_allclose(np.asarray(out.keypoints),
                               np.asarray(ref.keypoints), atol=1e-3)
    assert (np.asarray(out.kp_mask) == np.asarray(ref.kp_mask)).all()
    np.testing.assert_allclose(np.asarray(out.lines), np.asarray(ref.lines),
                               atol=1e-2)


def test_mesh_pipelined_runner_matches_sequential():
    """MeshPipelinedRunner (frame-parallel chunked detection over the mesh,
    overlapped with host tracking) must produce the same trajectory as the
    sequential loop — including a final partial chunk that exercises the
    mesh padding path."""
    from airslam_tpu.parallel.pipeline import MeshPipelinedRunner
    from airslam_tpu.pipelines.map_builder import MapBuilder, KeyframeConfig
    from tests.test_vo_pipeline import (
        FakeCamera, FakeMatcher, make_world, circle_trajectory, render_features,
    )
    import jax.tree_util as jtu

    cam = FakeCamera()
    pts, desc = make_world(seed=21)
    traj = circle_trajectory(10)
    rng_render = np.random.RandomState(77)
    rendered = [render_features(pts, desc, T, cam, rng_render) for T in traj]

    class ChunkStubDetector:
        """Batch-aware stub: serves precomputed per-frame features in call
        order, stacked to whatever (padded) batch sharded_detect asks for."""

        def __init__(self):
            self.i = 0

        def detect(self, images, detect_junctions=False):
            outs = []
            for _ in range(int(images.shape[0]) // 2):
                if self.i < len(rendered):
                    fl, fr, _ = rendered[self.i]
                    self.i += 1
                else:  # mesh padding rows — dropped by sharded_detect's slice
                    fl, fr, _ = rendered[0]
                outs.append(fl)
                outs.append(fr)
            return jtu.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *outs
            )

    class StubDataset:
        def __len__(self):
            return len(traj)

        def get(self, i):
            z = np.zeros((480, 752), np.float32)
            return i * 0.1, z, z, None

    kf = KeyframeConfig(min_init_stereo_feature=50, max_num_match=60,
                        tracking_point_rate=0.5)
    b_seq = MapBuilder(cam, None, FakeMatcher(), kf_config=kf)
    for i, (fl, fr, pairs) in enumerate(rendered):
        b_seq.track_features(i * 0.1, fl, fr, pairs)

    mesh = pmesh.make_mesh(8)
    b_mesh = MapBuilder(cam, ChunkStubDetector(), FakeMatcher(), kf_config=kf)
    runner = MeshPipelinedRunner(b_mesh, mesh)
    assert runner.chunk == 4  # 8 chips / 2 images per stereo frame
    runner.run(StubDataset())

    assert len(b_mesh.trajectory) == len(b_seq.trajectory)
    for (t0, T0), (t1, T1) in zip(b_seq.trajectory, b_mesh.trajectory):
        assert np.allclose(T0, T1, atol=1e-9)
