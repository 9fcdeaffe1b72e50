"""Relocalization pipeline (lightweight monocular query against a refined map).

Replaces ``src/map_user.cc``: detect (PLNet points+lines+junctions) → point +
junction BoW → shared-word filter (≥ max(0.3·max, 8)) → covisibility grouping
(group score = top-5 member scores) → junction structure-graph re-rank
(score += junction_score·(1 + line-preserving match rate)) → LightGlue vs the
top-3 groups → PnP → optional pose-only refinement; success iff inliers ≥
``min_inlier_num`` (45).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from airslam_tpu.backend import gn, windows
from airslam_tpu.loopclosure.database import Database
from airslam_tpu.slam.frame import Frame
from airslam_tpu.slam.map import Map


def junction_connections(junctions_xy, junc_mask, lines, line_mask, radius: float = 2.0):
    """Junction graph from line endpoints: junction j connects to k iff some
    line's endpoints fall within a (2r+1)² window of each
    (``Frame::FindJunctionConnections``, frame.cc:581-629).
    Returns list[set[int]] per junction."""
    j = len(junctions_xy)
    conns = [set() for _ in range(j)]
    valid_j = np.nonzero(junc_mask)[0]
    if len(valid_j) == 0:
        return conns
    jxy = junctions_xy[valid_j]
    for li in np.nonzero(line_mask)[0]:
        x1, y1, x2, y2 = lines[li]
        d1 = np.max(np.abs(jxy - [x1, y1]), axis=1)
        d2 = np.max(np.abs(jxy - [x2, y2]), axis=1)
        e1 = valid_j[d1 <= radius]
        e2 = valid_j[d2 <= radius]
        for a in e1:
            for b in e2:
                if a != b:
                    conns[a].add(int(b))
                    conns[b].add(int(a))
    return conns


class MapUser:
    def __init__(self, m: Map, detector, matcher, point_db: Database,
                 junction_db: Optional[Database], min_inlier_num: int = 45,
                 pose_refinement: bool = False, match_threshold=None,
                 projection_recovery: bool = True):
        self.map = m
        self.detector = detector
        self.matcher = matcher
        self.database = point_db
        self.junction_database = junction_db
        self.min_inlier_num = min_inlier_num
        self.pose_refinement = pose_refinement
        self.match_threshold = match_threshold
        # after a PnP pose, recover extra matches by projecting the loop
        # group's mappoints into the query (SearchByProjection semantics,
        # map.cc:945-998; the refiner's recovery through the loop group,
        # map_refiner.cc:237-460) — widens the viewpoint envelope beyond
        # what the direct LightGlue match budget reaches
        self.projection_recovery = projection_recovery
        # perfect-recall retrieval for envelope attribution (see
        # relocalize_frame; scripts/measure_reloc_envelope.py --oracle)
        self.oracle_retrieval = False
        # Wide-baseline bootstrap: with recovery available, a candidate whose
        # RAW LightGlue match count is below min_inlier_num can still seed
        # PnP — projection recovery then claims the matches the direct
        # matcher missed, and ACCEPTANCE still requires min_inlier_num
        # refined inliers (the reference gates the attempt itself at
        # min_inlier_num, map_user.cc:377-383; bootstrapping is a strict
        # superset that cannot accept anything the final gate rejects).
        self.bootstrap_min = (max(12, min_inlier_num // 3)
                              if projection_recovery else min_inlier_num)
        # stage diagnostics of the last relocalize_frame call (for envelope
        # analysis): candidate counts, per-attempt pair/PnP/recovery numbers
        self.last_stats: dict = {}
        self._frame_counter = 10_000_000
        # precompute per-keyframe junction connections
        self._kf_junc_conns: Dict[int, list] = {}
        for fid in m.keyframe_ids:
            kf = m.keyframes[fid]
            self._kf_junc_conns[fid] = junction_connections(
                kf.junctions, kf.junc_mask, kf.lines, kf.line_mask
            )

    # ------------------------------------------------------------------

    def relocalize_image(self, image):
        """image: (H, W) grayscale [0, 1] (already undistorted or raw — the
        map's rectify maps are applied if present). Returns (ok, Twc)."""
        if self.detector is None:
            raise RuntimeError("detector required for image queries")
        ml, _ = self.map.camera.rectify_maps()
        if ml is not None:
            from airslam_tpu.ops import remap_tiled

            plan = None
            if remap_tiled.available() and hasattr(self.map.camera,
                                                   "remap_plans"):
                plan, _ = self.map.camera.remap_plans()
            if plan is not None:
                image = remap_tiled.remap_planned(
                    jnp.asarray(image, jnp.float32), plan)
            else:
                from airslam_tpu.ops.gridsample import remap

                image = np.asarray(remap(jnp.asarray(image, jnp.float32), ml))
        import jax as _jax

        batch = (jnp.stack([image]) if isinstance(image, _jax.Array)
                 else np.asarray(image)[None])
        feats = self.detector.detect(batch, detect_junctions=True)
        import jax.tree_util as jtu

        f0 = jtu.tree_map(lambda t: np.asarray(t[0]), feats)
        frame = Frame(self._frame_counter, 0.0, f0, self.map.camera)
        self._frame_counter += 1
        return self.relocalize_frame(frame)

    def relocalize_frame(self, frame: Frame):
        """Core entry taking a built Frame (also the test surface)."""
        vec, wids, word_features = self.database.frame_to_bow(
            frame.kp_desc, frame.kp_mask
        )
        jvec = {}
        jwids = np.full(len(frame.junc_mask), -1)
        if self.junction_database is not None and frame.junc_mask.any():
            jvec, jwids, _ = self.junction_database.frame_to_bow(
                frame.junc_desc, frame.junc_mask
            )

        self.last_stats = {"n_candidates": 0, "n_groups": 0,
                           "pair_counts": [], "attempts": []}
        counts = self.database.query(vec)
        if self.oracle_retrieval:
            # attribution mode (scripts/measure_reloc_envelope.py --oracle):
            # perfect-recall retrieval — every keyframe is a candidate. The
            # recall measured here is the MATCHING ceiling; the gap to the
            # BoW run is the retrieval ceiling.
            cands = {f: counts.get(f, 0) for f in self.map.keyframe_ids}
        else:
            if not counts:
                return False, np.eye(4)
            max_sharing = max(counts.values())
            thr = max(int(max_sharing * 0.3), 8)
            cands = {f: c for f, c in counts.items() if c >= thr}
            # joint point+junction retrieval: wide-baseline views can lose
            # most shared POINT words while the sparser junction vocabulary
            # (structure words) still fires — surface frames that clear the
            # junction-sharing gate even when they miss the point gate
            # (extends map_user.cc:148-179, which queries points only)
            if self.junction_database is not None and jvec:
                jcounts = self.junction_database.query(jvec)
                if jcounts:
                    jthr = max(int(max(jcounts.values()) * 0.5), 4)
                    for f, c in jcounts.items():
                        if c >= jthr and f not in cands:
                            cands[f] = counts.get(f, 0)
        if not cands:
            return False, np.eye(4)

        cand_ids = list(cands)
        scores = dict(zip(cand_ids, self.database.batched_scores(vec, cand_ids)))

        # grouping (map_user.cc:180-242); group score = top-5 member scores.
        # Members include ALL covisible keyframes (query expansion), not just
        # scored candidates — the recovery stages project/match through the
        # whole group, so an unscored covisible neighbor still contributes
        # its mappoints even though it adds nothing to the group score.
        groups: Dict[int, dict] = {}
        for f, s in scores.items():
            deputy, dscore = f, s
            members = {f}
            for cf in self.map.covisible_frames(f, min_shared=11):
                members.add(cf)
                if cf in scores and scores[cf] > dscore:
                    deputy, dscore = cf, scores[cf]
            gscore = sum(sorted((scores.get(m, 0.0) for m in members),
                                reverse=True)[:5])
            if deputy not in groups or groups[deputy]["score"] < gscore:
                groups[deputy] = dict(score=gscore, members=members)

        # junction structure-graph re-rank (map_user.cc:285-349) BEFORE the
        # survivor pruning: a junction-retrieved group typically has a weak
        # point score and must be able to earn its slot through the re-rank
        if self.junction_database is not None and frame.junc_mask.any():
            q_conns = junction_connections(
                frame.junctions, frame.junc_mask, frame.lines, frame.line_mask
            )
            for deputy, g in groups.items():
                g["score"] += self._junction_score(deputy, jvec, jwids, q_conns)

        best_score = max(g["score"] for g in groups.values())
        if len(groups) > 3 and not self.oracle_retrieval:
            groups = {d: g for d, g in groups.items() if g["score"] >= 0.5 * best_score}

        ordered = sorted(groups.items(), key=lambda kv: -kv[1]["score"])
        if not self.oracle_retrieval:
            # production path: top-3 groups (map_user.cc:242). Oracle mode
            # attempts EVERY group so the measured recall is the pure
            # matching/coverage ceiling, not an artifact of the cap.
            ordered = ordered[:3]

        cands = [(frame, self.map.keyframes[d]) for d, _ in ordered]
        if hasattr(self.matcher, "matching_points_batched"):
            # top-3 candidates in ONE vmapped dispatch (map_user.cc:360-376)
            results = self.matcher.matching_points_batched(
                cands, outlier_rejection=True, threshold=self.match_threshold
            )
        else:
            results = [
                self.matcher.matching_points(
                    a, b, outlier_rejection=True, threshold=self.match_threshold
                )
                for a, b in cands
            ]
        # attempt candidates best-match-count first; fall through to the next
        # candidate when PnP/refinement fails (the matches were already
        # computed in the one batched dispatch, so extra attempts only cost
        # the PnP — a strict superset of the reference's single best attempt)
        order = sorted(range(len(results)), key=lambda i: -len(results[i][0]))
        self.last_stats = stats = {
            "n_candidates": len(counts),
            "n_groups": len(groups),
            "pair_counts": [len(results[bi][0]) for bi in order],
            "attempts": [],
        }
        last_Twc = np.eye(4)
        for bi in order:
            pairs = results[bi][0]
            if len(pairs) < self.bootstrap_min:
                break  # sorted: nothing later can pass either
            loop_kf = self.map.keyframes[ordered[bi][0]]
            group_fids = groups[ordered[bi][0]]["members"]
            matched = {}
            for qi, li in pairs:
                tid = int(loop_kf.track_ids[li])
                mpt = self.map.mappoints.get(tid)
                if mpt is not None and mpt.is_valid:
                    matched[int(qi)] = mpt

            att = {"pairs": len(pairs), "seed_matched": len(matched)}
            stats["attempts"].append(att)
            ok, Twc, n_inliers = self._solve_pnp(frame, matched)
            att["pnp_ok"], att["pnp_inliers"] = ok, n_inliers
            if not ok:
                continue

            if self.projection_recovery:
                # two rounds: the re-estimated pose of round 1 projects more
                # accurately, so round 2 claims keypoints the coarse PnP pose
                # missed (the SearchByProjection→optimize→search-again loop
                # of map.cc:930-994 / map_refiner.cc:237-460). A bootstrap
                # seed (< min_inlier_num direct matches) gives a coarser PnP
                # pose, so its first projection round searches wider.
                for ri in range(2):
                    radius = 20.0 if (ri == 0 and
                                      len(matched) < self.min_inlier_num) else 15.0
                    extra = self._recover_matches(frame, Twc, loop_kf, matched,
                                                  radius=radius,
                                                  extra_fids=group_fids)
                    if not extra:
                        break
                    matched.update(extra)
                    ok2, Twc2, n2 = self._solve_pnp(frame, matched)
                    if ok2 and n2 >= n_inliers:
                        Twc, n_inliers = Twc2, n2
                    else:
                        break
                att["recovered_matched"] = len(matched)
                att["recovered_inliers"] = n_inliers

            frame.set_pose(Twc)
            last_Twc = Twc

            if self.pose_refinement:
                if len(matched) < max(10, self.bootstrap_min):
                    continue
                Twc, n_inliers = self._refine_pose(frame, matched)
                last_Twc = Twc
                if self.projection_recovery and n_inliers < self.min_inlier_num:
                    # marginal query: the GN-refined pose is the most accurate
                    # projection we will get — one post-refinement recovery
                    # round, then re-refine with the enlarged match set
                    extra = self._recover_matches(frame, Twc, loop_kf, matched,
                                                  extra_fids=group_fids)
                    if extra:
                        matched.update(extra)
                        frame.set_pose(Twc)
                        Twc, n_inliers = self._refine_pose(frame, matched)
                        last_Twc = Twc

            if (self.pose_refinement and self.projection_recovery
                    and self.bootstrap_min <= n_inliers < self.min_inlier_num):
                # marginal wide-baseline query: the NN descriptor gate of
                # _recover_matches saturates at large viewpoint change, but
                # the learned matcher does not — LightGlue the query against
                # the loop group's member keyframes (ONE batched dispatch)
                # and union the new mappoint matches. Measured ceiling on the
                # 1.0 m / 25 deg envelope point: union matching over in-view
                # keyframes reaches 61-96 refined inliers where per-deputy
                # matching + NN recovery plateaus at 22-40. Acceptance below
                # is unchanged (>= min_inlier_num refined inliers).
                extra = self._matcher_recovery(frame, Twc, loop_kf,
                                               group_fids, matched)
                att["matcher_recovered"] = len(extra)
                if extra:
                    matched.update(extra)
                    ok3, Twc3, n3 = self._solve_pnp(frame, matched)
                    if ok3:
                        # re-anchor on the RANSAC pose (the union can carry
                        # outliers the Huber refine alone would absorb), one
                        # NN recovery pass at the improved pose, re-refine
                        more = self._recover_matches(frame, Twc3, loop_kf,
                                                     matched,
                                                     extra_fids=group_fids)
                        matched.update(more)
                        frame.set_pose(Twc3)
                        Twc4, n4 = self._refine_pose(frame, matched)
                        if n4 > n_inliers:
                            Twc, n_inliers = Twc4, n4
                            last_Twc = Twc

            att["final_inliers"] = n_inliers
            if n_inliers >= self.min_inlier_num:
                att["accepted"] = True
                return True, Twc
        return False, last_Twc

    # ------------------------------------------------------------------

    def _junction_score(self, kf_id: int, jvec: dict, jwids, q_conns):
        """score = junction L1 score × (1 + line-preserving match rate)."""
        kf = self.map.keyframes[kf_id]
        if kf.junction_bow_vector is None:
            return 0.0
        jscore = self.junction_database.score(kf.junction_bow_vector, jvec)

        inv = self.junction_database.inverted_file
        kf_conns = self._kf_junc_conns.get(kf_id, [])
        nq = len(jwids)
        nk = len(kf_conns)

        # M[i, j] = query junction i and keyframe junction j share a word;
        # Cq/Ck = junction connectivity (joined by a detected line). The
        # reference's quadruple loop (map_user.cc:285-349) counts, per match
        # (i, j), line-preserving partner matches (a, b) with a~i, b~j and
        # M[a, b] — exactly Σ M ⊙ (Cq · M · Ckᵀ) as dense boolean matmuls.
        M = np.zeros((nq, max(nk, 1)), bool)
        for i, wid in enumerate(jwids):
            if wid < 0:
                continue
            for j in inv.get(int(wid), {}).get(kf_id, ()):
                if j < nk:
                    M[i, j] = True
        if not M.any():
            return jscore

        Cq = np.zeros((nq, nq), bool)
        for i, conns in enumerate(q_conns):
            for a in conns:
                if a < nq:
                    Cq[i, a] = True
        Ck = np.zeros((max(nk, 1), max(nk, 1)), bool)
        for j, conns in enumerate(kf_conns):
            for b in conns:
                if b < nk:
                    Ck[j, b] = True

        has_q = np.asarray([bool(c) for c in q_conns] + [False] * (nq - len(q_conns)))
        match_num = int(M[has_q[:nq]].sum())
        Mi = M.astype(np.int32)
        pair_counts = (Cq.astype(np.int32) @ Mi @ Ck.T.astype(np.int32))
        line_match_num = int((pair_counts * Mi).sum())
        rate = line_match_num / match_num if match_num > 0 else 0.0
        return jscore * (1.0 + rate)

    def _matcher_recovery(self, frame, Twc, loop_kf, group_fids, matched,
                          k: int = 8):
        """Learned-matcher recovery through the loop group: LightGlue the
        query against up to ``k`` member/covisible keyframes — nearest views
        first under the current pose estimate — in ONE batched dispatch, and
        return NEW {query_kpt_idx: Mappoint} matches. The TPU-idiomatic
        analogue of the reference's inverted-file match recovery through the
        loop group (map_refiner.cc:237-460): where that recovers matches by
        per-word descriptor lookup, this recovers them with the full matcher,
        which survives viewpoint gaps the per-descriptor NN gate does not."""
        pool = set(group_fids) | set(
            self.map.covisible_frames(loop_kf.frame_id, min_shared=11))
        pool.discard(loop_kf.frame_id)
        kfs = [self.map.keyframes[f] for f in pool if f in self.map.keyframes]
        if not kfs:
            return {}
        c, z = Twc[:3, 3], Twc[:3, 2]
        kfs.sort(key=lambda kf: float(
            np.linalg.norm(kf.Twc[:3, 3] - c) - kf.Twc[:3, 2] @ z))
        kfs = kfs[:k]
        cands = [(frame, kf) for kf in kfs]
        if hasattr(self.matcher, "matching_points_batched"):
            results = self.matcher.matching_points_batched(
                cands, outlier_rejection=True, threshold=self.match_threshold)
        else:
            results = [self.matcher.matching_points(
                a, b, outlier_rejection=True, threshold=self.match_threshold)
                for a, b in cands]
        matched_tids = {id(m) for m in matched.values()}
        out, best = {}, {}
        for kf, (pairs, scores) in zip(kfs, results):
            if scores is None or len(scores) != len(pairs):
                scores = np.ones(len(pairs))
            for (qi, li), sc in zip(pairs, scores):
                qi = int(qi)
                if qi in matched:
                    continue
                mpt = self.map.mappoints.get(int(kf.track_ids[li]))
                if mpt is None or not mpt.is_valid or id(mpt) in matched_tids:
                    continue
                if qi not in best or best[qi] < sc:
                    best[qi] = float(sc)
                    out[qi] = mpt
        return out

    def _recover_matches(self, frame, Twc, loop_kf, matched,
                         radius: float = 15.0, dist_thr: float = 0.35,
                         ratio: float = 0.85, extra_fids=()):
        """Project the loop group's mappoints through the PnP pose and claim
        unmatched query keypoints near their projections. Descriptor gates
        follow ``Map::SearchByProjection`` (map.cc:977-994): best 1−dot
        distance < ``dist_thr`` AND < ``ratio``·second-best, radius 15 px.
        Mappoint descriptors come from an observing keyframe's stored
        features (mappoint descriptors are not serialized — mappoint.h:56-64).
        Returns {query_kpt_idx: Mappoint} of NEW matches only."""
        cam = self.map.camera
        Rwc = Twc[:3, :3]
        twc = Twc[:3, 3]

        matched_tids = {id(m) for m in matched.values()}
        cand_pos, cand_desc, cand_mpt = [], [], []
        fids = [loop_kf.frame_id] + list(
            self.map.covisible_frames(loop_kf.frame_id, min_shared=11))
        # the retrieval group's members widen the projection pool — a novel
        # viewpoint between mapped keyframes sees points that the single best
        # keyframe and its covisibles do not cover
        fids += [f for f in extra_fids if f not in fids]
        seen = set()
        for fid in fids:
            kf = self.map.keyframes.get(fid)
            if kf is None:
                continue
            for idx, tid in enumerate(kf.track_ids):
                tid = int(tid)
                if tid < 0 or tid in seen:
                    continue
                seen.add(tid)
                mpt = self.map.mappoints.get(tid)
                if mpt is None or not mpt.is_valid or id(mpt) in matched_tids:
                    continue
                desc = mpt.descriptor
                if desc is None:
                    desc = kf.kp_desc[idx]
                cand_pos.append(mpt.position)
                cand_desc.append(np.asarray(desc, np.float32))
                cand_mpt.append(mpt)
        if not cand_mpt:
            return {}

        pos = np.asarray(cand_pos)
        descs = np.stack(cand_desc)
        pc = (pos - twc) @ Rwc  # Rcw @ (pw − twc)
        z = pc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = pc[:, 0] / z * cam.fx + cam.cx
            v = pc[:, 1] / z * cam.fy + cam.cy
        w = getattr(cam, "image_width", getattr(cam, "width", 752))
        h = getattr(cam, "image_height", getattr(cam, "height", 480))
        vis = (z > 0.2) & (u > 0) & (u < w) & (v > 0) & (v < h)
        if not vis.any():
            return {}

        free = [i for i in range(len(frame.keypoints))
                if frame.kp_mask[i] and i not in matched]
        if not free:
            return {}
        kp = np.asarray([frame.keypoints[i] for i in free])
        kdesc = np.stack([np.asarray(frame.kp_desc[i], np.float32) for i in free])

        uv = np.stack([u, v], -1)[vis]
        mdesc = descs[vis]
        mpts = [m for m, ok in zip(cand_mpt, vis) if ok]

        d2 = ((uv[:, None, :] - kp[None, :, :]) ** 2).sum(-1)  # (M, Q)
        within = d2 <= radius * radius
        dist = 1.0 - mdesc @ kdesc.T  # (M, Q) DescriptorDistance (utils.cc:15)
        dist = np.where(within, dist, 4.0)

        order = np.argsort(dist, axis=1)
        best_q = order[:, 0]
        best = dist[np.arange(len(mpts)), best_q]
        second = (dist[np.arange(len(mpts)), order[:, 1]]
                  if dist.shape[1] > 1 else np.full(len(mpts), 4.0))
        accept = (best < dist_thr) & (best < ratio * second)

        out = {}
        claimed = {}
        for mi in np.nonzero(accept)[0]:
            qi = free[int(best_q[mi])]
            if qi in claimed and claimed[qi] <= best[mi]:
                continue
            claimed[qi] = best[mi]
            out[qi] = mpts[mi]
        return out

    def _solve_pnp(self, frame, matched):
        if cv2 is None or len(matched) < 8:
            return False, np.eye(4), 0
        cam = self.map.camera
        obj = np.asarray([m.position for m in matched.values()], np.float64)
        img = np.asarray([frame.keypoints[i] for i in matched], np.float64)
        K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
        try:
            ok, rvec, tvec, inl = cv2.solvePnPRansac(
                obj, img, K, np.zeros(5), iterationsCount=100,
                reprojectionError=20.0, confidence=0.99,
            )
        except cv2.error:
            return False, np.eye(4), 0
        if not ok:
            return False, np.eye(4), 0
        Rcw, _ = cv2.Rodrigues(rvec)
        Twc = np.eye(4)
        Twc[:3, :3] = Rcw.T
        Twc[:3, 3] = -Rcw.T @ tvec[:, 0]
        return True, Twc, 0 if inl is None else len(inl)

    def _refine_pose(self, frame, matched):
        """Pose-only GN refinement against the matched mappoints."""
        p = len(matched)
        P = max(64, 1 << (p - 1).bit_length())
        points = np.zeros((P, 3))
        obs = np.zeros((P, 1, 3))
        obs[..., 2] = -1.0
        mask = np.zeros((P, 1), bool)
        for j, (qi, mpt) in enumerate(matched.items()):
            points[j] = mpt.position
            obs[j, 0] = frame.keypoint_position(qi)
            mask[j, 0] = True
        cam = self.map.camera
        Tcb = cam.Tcb
        Twb = frame.Twc @ Tcb
        problem = gn.BAProblem(
            frames=gn.FrameStates(
                Rwb=jnp.asarray(Twb[None, :3, :3]), twb=jnp.asarray(Twb[None, :3, 3]),
                vel=jnp.zeros((1, 3)), bg=jnp.zeros((1, 3)), ba=jnp.zeros((1, 3)),
            ),
            pose_fixed=jnp.zeros(1, bool), vel_fixed=jnp.ones(1, bool),
            points=jnp.asarray(points), point_fixed=jnp.ones(P, bool),
            point_obs=jnp.asarray(obs), point_obs_mask=jnp.asarray(mask),
            lines=jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]]), line_fixed=jnp.ones(1, bool),
            line_obs=jnp.zeros((1, 1, 8)), line_obs_stereo=jnp.zeros((1, 1), bool),
            line_obs_mask=jnp.zeros((1, 1), bool),
            line_obs_sigma=jnp.full((1, 1), 0.5),
            Rwg=jnp.asarray(self.map.Rwg), gravity_free=jnp.asarray(0.0), imu=None,
            Rcb=jnp.asarray(Tcb[:3, :3]), tcb=jnp.asarray(Tcb[:3, 3]),
        )
        out, _, _, n_in = windows.pose_only_optimization(
            problem, self.map._intr, self.map.ba_config
        )
        Twb_new = np.eye(4)
        Twb_new[:3, :3] = np.asarray(out.frames.Rwb[0])
        Twb_new[:3, 3] = np.asarray(out.frames.twb[0])
        return Twb_new @ np.linalg.inv(Tcb), int(n_in)
