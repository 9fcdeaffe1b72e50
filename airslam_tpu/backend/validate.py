"""Numeric validation printers.

Replaces the reference's ``Validate*`` debug functions
(g2o_optimization.cc:1158-1429): print residual statistics of a problem
before/after optimization, and the map-consistency numbers. These are
developer tools — invoked ad hoc, like the reference's commented call sites.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from airslam_tpu.backend import gn


def validate_reprojection(problem: gn.BAProblem, intr, label: str = "") -> dict:
    """Chi² statistics of all active point/line observations."""
    pchi2, depth_ok = gn.point_chi2(problem, intr)
    pmask = np.asarray(problem.point_obs_mask)
    p = np.asarray(pchi2)[pmask]
    lchi2 = np.asarray(gn.line_chi2(problem, intr, 1.0))[np.asarray(problem.line_obs_mask)]
    stats = dict(
        n_point_obs=int(pmask.sum()),
        point_chi2_mean=float(p.mean()) if len(p) else 0.0,
        point_chi2_max=float(p.max()) if len(p) else 0.0,
        depth_violations=int((~np.asarray(depth_ok))[pmask].sum()),
        n_line_obs=len(lchi2),
        line_chi2_mean=float(lchi2.mean()) if len(lchi2) else 0.0,
    )
    print(f"[validate{':' + label if label else ''}] " +
          " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                   for k, v in stats.items()))
    return stats


def validate_imu(problem: gn.BAProblem, label: str = "") -> dict:
    """9-d IMU residual norms per factor (ValidateError equivalent)."""
    if problem.imu is None:
        print("[validate] no IMU factors")
        return {}
    r, _ = gn._imu_residuals(problem, with_jac=False)
    r = np.asarray(r)[np.asarray(problem.imu.mask)]
    stats = dict(
        n_factors=len(r),
        er_rms=float(np.sqrt((r[:, 0:3] ** 2).mean())) if len(r) else 0.0,
        ev_rms=float(np.sqrt((r[:, 3:6] ** 2).mean())) if len(r) else 0.0,
        ep_rms=float(np.sqrt((r[:, 6:9] ** 2).mean())) if len(r) else 0.0,
    )
    print(f"[validate-imu{':' + label if label else ''}] " +
          " ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                   for k, v in stats.items()))
    return stats
