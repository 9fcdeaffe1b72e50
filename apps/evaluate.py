#!/usr/bin/env python
"""Trajectory evaluation — equivalent of ``scripts/evaluation.py``: ATE RMSE
with Sim(3) alignment (evo_ape tum -as) and the LOST criterion (estimated
trajectory ends > 10 s before ground truth, evaluation.py:75-83)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--est", required=True, help="estimated TUM trajectory")
    ap.add_argument("--gt", required=True, help="ground-truth TUM trajectory")
    ap.add_argument("--no_align", action="store_true")
    ap.add_argument("--lost_gap", type=float, default=10.0)
    args = ap.parse_args()

    from airslam_tpu.io.trajectory import load_tum, ate_rmse

    est = load_tum(args.est)
    gt = load_tum(args.gt)
    if not est or not gt:
        print("LOST (empty trajectory)")
        return 1

    if gt[-1][0] - est[-1][0] > args.lost_gap:
        print(f"LOST (trajectory ends {gt[-1][0] - est[-1][0]:.1f} s early)")
        return 1

    # associate by timestamps (nearest within 20 ms)
    import numpy as np

    gt_times = np.asarray([t for t, _ in gt])
    pairs_e, pairs_g = [], []
    for t, T in est:
        j = int(np.argmin(np.abs(gt_times - t)))
        if abs(gt_times[j] - t) < 0.02:
            pairs_e.append((t, T))
            pairs_g.append(gt[j])
    if len(pairs_e) < 3:
        print("LOST (no timestamp association)")
        return 1

    rmse = ate_rmse(pairs_e, pairs_g, align=not args.no_align)
    print(f"ATE RMSE: {rmse:.6f} m over {len(pairs_e)} poses")
    return 0


if __name__ == "__main__":
    sys.exit(main())
