"""Multi-chip bundle adjustment: shard the landmark grids over the device
mesh.

The BA assembly (``backend.gn``) reduces over the landmark axis everywhere —
per-frame Hessian blocks, the Schur complement and its RHS are sums of
per-landmark contributions. Sharding ``points``/``lines`` and their
observation grids over the ``dp`` mesh axis makes every einsum a partial sum
per chip; XLA inserts the ``psum`` over ICI automatically when the jitted
``local_ba`` runs under the mesh. The reduced camera system (small, dense)
solves replicated on every chip.

This is additive capability over the single-process reference (SURVEY §2.6):
global BA over a large map scales to N chips with no code changes to the
solver itself.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from airslam_tpu.backend import gn


def shard_problem(problem: gn.BAProblem, mesh: Mesh) -> gn.BAProblem:
    """Lay out the problem for the mesh: landmark-major arrays sharded over
    'dp', frame states and camera replicated. Landmark counts are already
    padded to power-of-two buckets, so they divide the mesh."""
    dp = mesh.shape["dp"]
    land_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def put(x, sh):
        return jax.device_put(x, sh)

    def land(x):
        # replicate when the landmark bucket doesn't divide the mesh
        return put(x, land_sh if x.shape[0] % dp == 0 else repl)

    return problem._replace(
        frames=jax.tree_util.tree_map(lambda t: put(t, repl), problem.frames),
        pose_fixed=put(problem.pose_fixed, repl),
        vel_fixed=put(problem.vel_fixed, repl),
        points=land(problem.points),
        point_fixed=land(problem.point_fixed),
        point_obs=land(problem.point_obs),
        point_obs_mask=land(problem.point_obs_mask),
        lines=land(problem.lines),
        line_fixed=land(problem.line_fixed),
        line_obs=land(problem.line_obs),
        line_obs_stereo=land(problem.line_obs_stereo),
        line_obs_mask=land(problem.line_obs_mask),
        Rwg=put(problem.Rwg, repl),
        gravity_free=put(problem.gravity_free, repl),
        imu=jax.tree_util.tree_map(lambda t: put(t, repl), problem.imu)
        if problem.imu is not None
        else None,
        Rcb=put(problem.Rcb, repl),
        tcb=put(problem.tcb, repl),
    )


def sharded_global_ba(problem: gn.BAProblem, intr, cfg: gn.BAConfig, mesh: Mesh,
                      iters1: int = 50, iters2: int = 40):
    """Run the two-stage global BA with landmark-sharded inputs."""
    from airslam_tpu.backend import windows

    problem = shard_problem(problem, mesh)
    with mesh:
        return windows.local_ba(problem, intr, cfg, iters1=iters1, iters2=iters2)


# ---------------------------------------------------------------------------
# Map-scale sparse GlobalBA over the mesh: observations AND landmarks shard
# over 'dp'; per-frame blocks, the reduced camera matrix and its solve stay
# replicated (XLA turns every scatter-add/einsum over sharded operands into
# local partials + psum over ICI).
# ---------------------------------------------------------------------------


def shard_sparse_problem(prob, mesh: Mesh):
    from airslam_tpu.backend import global_ba as gba

    dp = mesh.shape["dp"]
    sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    def maybe(x):
        return put(x, sh if x.shape[0] % dp == 0 else repl)

    return prob._replace(
        Rwb=put(prob.Rwb, repl), twb=put(prob.twb, repl),
        pose_fixed=put(prob.pose_fixed, repl),
        points=maybe(prob.points),
        pobs_pidx=maybe(prob.pobs_pidx), pobs_fidx=maybe(prob.pobs_fidx),
        pobs=maybe(prob.pobs), pobs_mask=maybe(prob.pobs_mask),
        point_obs_table=maybe(prob.point_obs_table),
        lines=maybe(prob.lines),
        lobs_lidx=maybe(prob.lobs_lidx), lobs_fidx=maybe(prob.lobs_fidx),
        lobs=maybe(prob.lobs), lobs_stereo=maybe(prob.lobs_stereo),
        lobs_mask=maybe(prob.lobs_mask), lobs_sigma=maybe(prob.lobs_sigma),
        line_obs_table=maybe(prob.line_obs_table),
        Rcb=put(prob.Rcb, repl), tcb=put(prob.tcb, repl),
    )


def sharded_sparse_global_ba(prob, intr, cfg: gn.BAConfig, mesh: Mesh,
                             iters1: int = 50, iters2: int = 40,
                             chunk: int = 2048):
    from airslam_tpu.backend import global_ba as gba

    prob = shard_sparse_problem(prob, mesh)
    with mesh:
        return gba.global_ba(prob, intr, cfg, iters1=iters1, iters2=iters2,
                             chunk=chunk)
