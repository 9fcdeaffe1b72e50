"""Visual(-inertial) odometry pipeline.

Replaces ``src/map_builder.cc``. Same stages, same decision logic:

1. input: rectify both views (device remap, camera.cc:161-182 equivalent)
2. detect + stereo match (one fused frontend program, vs 4 TRT executions)
3. stereo gating + frame construction (frame.cc:139-199)
4. track vs last keyframe: line matches from point matches
   (map_builder.cc:230-283), initial pose by IMU predict / PnP-RANSAC / last
   pose (map_builder.cc:285-315), pose-only optimization, inlier track-id
   propagation
5. keyframe policy ``AddKeyframeCheck`` (map_builder.cc:429-466)
6. keyframe insertion → Map (landmark creation, local BA, IMU init)

Concurrency: the reference runs a 2-thread pipeline with bounded queues
(map_builder.cc:33-49). Here the frontend is a single fused device program,
so the host loop is sequential by default; an optional double-buffered mode
overlaps frame t+1's detection with frame t's tracking via JAX async dispatch
(device work is queued, host bookkeeping runs concurrently).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from airslam_tpu.core.imu import Preintegration
from airslam_tpu.slam.frame import Frame
from airslam_tpu.slam.map import Map


@dataclasses.dataclass
class KeyframeConfig:
    """configs/visual_odometry/*.yaml `keyframe` block."""

    min_init_stereo_feature: int = 90
    lost_num_match: int = 10
    min_num_match: int = 30
    max_num_match: int = 80
    tracking_point_rate: float = 0.65
    tracking_parallax_rate: float = 0.1


# init pose convention of the reference (map_builder.cc:182-185): camera
# z-forward mapped into a z-up world.
INIT_TWC = np.array(
    [[0.0, 0.0, 1.0, 0.0],
     [-1.0, 0.0, 0.0, 0.0],
     [0.0, -1.0, 0.0, 0.0],
     [0.0, 0.0, 0.0, 1.0]]
)


class MapBuilder:
    def __init__(self, camera, detector, matcher, kf_config: Optional[KeyframeConfig] = None,
                 ba_config=None, match_threshold: Optional[float] = None,
                 publisher=None, use_jax_pnp: bool = False):
        """detector/matcher: FeatureDetector / PointMatcher (or test doubles
        with the same interface). ``publisher``: optional io.publisher.Publisher
        receiving frame-pose / keyframe / map messages (the RosPublisher role,
        map_builder.cc:497-548). ``use_jax_pnp``: device-resident RANSAC DLT
        (backend/pnp.py) instead of cv2.solvePnPRansac."""
        self.camera = camera
        self.detector = detector
        self.matcher = matcher
        self.kf_config = kf_config or KeyframeConfig()
        self.map = Map(camera, ba_config)
        self.match_threshold = match_threshold
        self.publisher = publisher
        self.use_jax_pnp = use_jax_pnp

        self.init = False
        self.insert_next_keyframe = True
        self.last_keyframe: Optional[Frame] = None
        self.last_tracked_frame: Optional[Frame] = None
        self.frame_counter = 0
        self.track_id_counter = 0
        self.line_track_id_counter = 0
        self.preintegration: Optional[Preintegration] = None
        # per-frame trajectory as (timestamp, ref_keyframe, T_ref_frame):
        # composing against the reference keyframe's CURRENT pose keeps every
        # entry consistent after map-wide corrections (VI gravity alignment,
        # pose graph, global BA) — the reference sidesteps this by saving only
        # keyframes (map_builder.cc:550-557); we keep the full-rate trajectory
        self._trajectory: List[tuple] = []

        self._maps = camera.rectify_maps() if hasattr(camera, "rectify_maps") else (None, None)

    # ------------------------------------------------------------------

    def rectify(self, image_left, image_right):
        ml, mr = self._maps
        if ml is None:
            return image_left, image_right
        from airslam_tpu.ops import remap_tiled

        if remap_tiled.available():
            pl_, pr_ = self.camera.remap_plans() if hasattr(
                self.camera, "remap_plans") else (None, None)
            if pl_ is not None and pr_ is not None:
                # device-resident: the tiled Pallas kernel rectifies on-chip
                # and the arrays feed detect() without a host round trip
                l = remap_tiled.remap_planned(
                    jnp.asarray(image_left, jnp.float32), pl_)
                r = remap_tiled.remap_planned(
                    jnp.asarray(image_right, jnp.float32), pr_)
                return l, r
        from airslam_tpu.ops.gridsample import remap

        l = np.asarray(remap(jnp.asarray(image_left, jnp.float32), ml))
        r = np.asarray(remap(jnp.asarray(image_right, jnp.float32), mr))
        return l, r

    def add_input(self, timestamp: float, image_left, image_right, imu_batch=None):
        """One stereo frame (+ IMU rows since the previous frame).
        Images: (H, W) grayscale in [0, 1]. Returns the tracked Frame.

        Set ``self.stage_timer`` (utils.timing.Timer) for a per-stage
        breakdown (detect / stereo_match / track) — the per-frame timing the
        reference prints in demo/visual_odometry.cpp:49-58."""
        import contextlib

        timer = getattr(self, "stage_timer", None)

        def sect(name):
            return timer.section(name) if timer is not None else contextlib.nullcontext()

        with sect("rectify"):
            left, right = self.rectify(image_left, image_right)
        with sect("detect"):
            # junctions ride along (same fused program): keyframes need them
            # for the refiner's junction vocabulary and the reloc
            # structure-graph re-rank (map_refiner.cc:956-999)
            stack = jnp.stack if isinstance(left, jax.Array) else np.stack
            feats = self.detector.detect(stack([left, right]),
                                         detect_junctions=True)
            import jax.tree_util as jtu

            # ONE host pull of the whole feature tree — per-leaf ``t[0]``
            # slices cost a device dispatch + transfer each (~22 per frame;
            # through the TPU tunnel each is a network round trip)
            feats_np = jax.device_get(feats)
            f0 = jtu.tree_map(lambda t: t[0], feats_np)
            f1 = jtu.tree_map(lambda t: t[1], feats_np)
        with sect("stereo_match"):
            pairs, temporal = self._stereo_and_temporal(f0, f1)
        with sect("track"):
            return self.track_features(timestamp, f0, f1, pairs, imu_batch,
                                       temporal_matches=temporal)

    def _stereo_and_temporal(self, f0, f1):
        """ONE batched matcher dispatch per frame: the stereo pair and (once
        tracking) the temporal match against the last keyframe — instead of
        two sequential programs (the reference pays two LightGlue engine
        executions per frame, map_builder.cc:56-155). Returns
        (stereo_pairs, temporal_pairs-or-None)."""
        if (self.init and self.last_keyframe is not None
                and hasattr(self.matcher, "matching_points_batched")):
            res = self.matcher.matching_points_batched(
                [(f0, f1), (self.last_keyframe, f0)],
                threshold=self.match_threshold,
            )
            return res[0][0], res[1][0]
        pairs, _ = self.matcher.matching_points(f0, f1, threshold=self.match_threshold)
        return pairs, None

    # ------------------------------------------------------------------

    def track_features(self, timestamp, feats_left, feats_right, stereo_pairs,
                       imu_batch=None, temporal_matches=None):
        """Core pipeline entry taking pre-computed features (also the test
        surface). feats_*: FrameFeatures-like; stereo_pairs: (M, 2);
        ``temporal_matches``: optional precomputed last-keyframe matches
        (from the batched dispatch in :meth:`_stereo_and_temporal`)."""
        frame = self._build_frame(timestamp, feats_left, feats_right, stereo_pairs)

        if self.camera_uses_imu() and imu_batch is not None and self.last_keyframe is not None:
            if self.preintegration is None:
                self.preintegration = self._new_preintegration()
            self.preintegration.add_batch(
                imu_batch, self.last_keyframe.timestamp
                if self.preintegration.start_time < 0 else self.preintegration.end_time,
                timestamp,
            )

        if not self.init:
            if frame.good_stereo_points >= self.kf_config.min_init_stereo_feature:
                self._initialize(frame)
            return frame

        matches = (temporal_matches if temporal_matches is not None
                   else self._match_frames(self.last_keyframe, frame))
        num_inliers = self._track_frame(self.last_keyframe, frame, matches)

        self._trajectory.append((
            timestamp, self.last_keyframe,
            np.linalg.inv(self.last_keyframe.Twc) @ frame.Twc,
        ))

        if num_inliers <= self.kf_config.lost_num_match:
            self.last_tracked_frame = frame
            self.insert_next_keyframe = True
            return frame

        decision = self._keyframe_check(self.last_keyframe, frame, matches)
        if decision == 0 or self.insert_next_keyframe:
            self._insert_keyframe(frame)
            self.insert_next_keyframe = False
        elif decision == 1:
            self.insert_next_keyframe = True

        self.last_tracked_frame = frame
        self._publish(frame)
        return frame

    def _publish(self, frame: Frame):
        if self.publisher is None:
            return
        from airslam_tpu.io import publisher as pub

        self.publisher.publish_frame_pose(
            pub.FramePoseMessage(time=frame.timestamp, pose=frame.Twc.copy())
        )
        m = self.map
        self.publisher.publish_keyframes(
            pub.KeyframeMessage(
                time=frame.timestamp, ids=list(m.keyframe_ids),
                poses=[m.keyframes[f].Twc.copy() for f in m.keyframe_ids],
            )
        )
        pts = np.asarray([p.position for p in m.mappoints.values() if p.is_valid])
        self.publisher.publish_map(pub.MapMessage(time=frame.timestamp, points=pts))
        ends = np.asarray([l.endpoints for l in m.maplines.values()
                           if l.is_valid and l.endpoints_valid])
        self.publisher.publish_maplines(
            pub.MaplineMessage(time=frame.timestamp, endpoints=ends)
        )

    # ------------------------------------------------------------------

    def camera_uses_imu(self):
        return bool(getattr(self.camera, "use_imu", False))

    def _new_preintegration(self):
        c = self.camera
        return Preintegration(
            noise=(c.gyr_noise, c.acc_noise, c.gyr_walk, c.acc_walk)
        )

    def _build_frame(self, timestamp, feats_left, feats_right, stereo_pairs):
        from airslam_tpu.frontend.lines import frame_relations

        frame = Frame(self.frame_counter, timestamp, feats_left, self.camera)
        self.frame_counter += 1
        pairs = np.asarray(stereo_pairs).reshape(-1, 2)
        frame.good_stereo_points = frame.add_right_features(
            _as_np_features(feats_right), pairs, self.camera
        )

        # left point-on-line relation + right relation + stereo line match
        # in ONE fused dispatch (3 separate jitted calls cost 3x dispatch
        # glue + device_put on the host path)
        fr = _as_np_features(feats_right)
        k = frame.keypoints.shape[0]
        idx1 = np.full(k, -1, np.int32)
        msk = np.zeros(k, bool)
        if len(pairs):
            idx1[pairs[:, 0]] = pairs[:, 1].astype(np.int32)
            msk[pairs[:, 0]] = True
        dt = np.float64 if jax.config.jax_enable_x64 else np.float32
        rel, lm = frame_relations(
            frame.lines.astype(dt), frame.line_mask,
            frame.keypoints.astype(dt), frame.kp_mask,
            fr.lines.astype(dt), fr.line_mask,
            fr.keypoints.astype(dt), fr.kp_mask, idx1, msk,
        )
        frame.points_on_lines = np.asarray(rel)
        lm = np.asarray(lm)
        sel = np.nonzero(lm >= 0)[0]
        frame.lines_right[sel] = fr.lines[lm[sel]]
        frame.lines_right_valid[sel] = True
        return frame

    def _initialize(self, frame: Frame):
        """map_builder.cc:181-199: fixed init pose, assign track ids, insert."""
        frame.set_pose(INIT_TWC)
        self._assign_new_track_ids(frame)
        frame.previous_frame = None
        self.map.insert_keyframe(frame)
        self.last_keyframe = frame
        self.last_tracked_frame = frame
        self.init = True
        self._trajectory.append((frame.timestamp, frame, np.eye(4)))

    def _assign_new_track_ids(self, frame: Frame):
        for i in np.nonzero(frame.kp_mask)[0]:
            if frame.track_ids[i] < 0:
                frame.track_ids[i] = self.track_id_counter
                self.track_id_counter += 1
        for i in np.nonzero(frame.line_mask)[0]:
            if frame.line_track_ids[i] < 0:
                frame.line_track_ids[i] = self.line_track_id_counter
                self.line_track_id_counter += 1

    def _match_frames(self, ref: Frame, cur: Frame):
        m = self.matcher.match(
            ref.keypoints, ref.kp_scores, ref.kp_desc, ref.kp_mask,
            cur.keypoints, cur.kp_scores, cur.kp_desc, cur.kp_mask,
            threshold=self.match_threshold,
        )
        mask = np.asarray(m.mask)
        i0 = np.nonzero(mask)[0]
        i1 = np.asarray(m.idx1)[i0]
        return np.stack([i0, i1], axis=-1).astype(np.int32) if len(i0) else np.zeros((0, 2), np.int32)

    # -- tracking (map_builder.cc:230-426) ---------------------------------

    def _track_frame(self, ref: Frame, cur: Frame, matches) -> int:
        from airslam_tpu.frontend.lines import match_lines_by_points

        k = ref.keypoints.shape[0]
        idx1 = np.full(k, -1, np.int32)
        msk = np.zeros(k, bool)
        if len(matches):
            m = np.asarray(matches)
            idx1[m[:, 0]] = m[:, 1].astype(np.int32)
            msk[m[:, 0]] = True
        line_matches = np.asarray(
            match_lines_by_points(
                ref.points_on_lines, cur.points_on_lines, idx1, msk,
            )
        )

        # gather tracked mappoints for pose optimization
        matched_mpt_idx = []  # (cur_idx, mappoint)
        for i0, i1 in matches:
            tid = int(ref.track_ids[i0])
            mpt = self.map.mappoints.get(tid)
            if mpt is not None and mpt.is_valid:
                matched_mpt_idx.append((int(i1), mpt))

        num_inliers, inlier_flags = self._frame_pose_optimization(ref, cur, matched_mpt_idx)

        if num_inliers > self.kf_config.lost_num_match:
            inlier_set = set(i for i, ok in inlier_flags if ok)
            for i0, i1 in matches:
                if ref.track_ids[i0] >= 0 and (int(i1) in inlier_set or
                                               int(ref.track_ids[i0]) not in self.map.mappoints):
                    cur.track_ids[i1] = ref.track_ids[i0]
                    cur.mappoint_ids[i1] = ref.mappoint_ids[i0]
            for i, j in enumerate(line_matches):
                if j >= 0 and ref.line_track_ids[i] >= 0:
                    cur.line_track_ids[j] = ref.line_track_ids[i]
                    cur.mapline_ids[j] = ref.mapline_ids[i]
        return num_inliers

    def _frame_pose_optimization(self, ref: Frame, cur: Frame, matched):
        """IMU-predict / PnP initial pose + pose-only GN
        (map_builder.cc:285-426). ``matched``: [(cur_idx, Mappoint)]."""
        Twc = np.eye(4)
        predicted = False
        if (
            self.map.imu_initialized
            and self.preintegration is not None
            and self.preintegration.valid()
            and self.preintegration.dT < 2.0
        ):
            Twb0 = ref.imu_pose(self.camera.Tcb)
            Twb1, vwb1 = self.preintegration.predict(Twb0, ref.velocity, self.camera.g_value)
            Twc = Twb1 @ np.linalg.inv(self.camera.Tcb)
            if np.linalg.norm(Twc[:3, 3] - self.last_tracked_frame.Twc[:3, 3]) < 1.0:
                predicted = True
                cur.velocity = vwb1

        if not predicted:
            Twc, n_pnp = self._solve_pnp(cur, matched)
            if (
                np.linalg.norm(Twc[:3, 3] - self.last_tracked_frame.Twc[:3, 3]) > 1.0
                or n_pnp < self.kf_config.lost_num_match
            ):
                Twc = self.last_tracked_frame.Twc.copy()

        cur.set_pose(Twc)

        if not matched:
            return 0, []

        use_imu_factor = (
            self.map.imu_initialized
            and self.preintegration is not None
            and self.preintegration.valid()
        )
        return self._pose_only(cur, matched, ref if use_imu_factor else None)

    def _solve_pnp(self, cur: Frame, matched):
        """PnP-RANSAC initial pose (g2o_optimization.cc:1085-1134: 100 iters,
        20 px, 0.99). Uses the host cv2 wrapper by default (reference parity);
        set ``use_jax_pnp=True`` on the builder for the fully device-resident
        RANSAC (backend/pnp.py)."""
        if len(matched) < 8:
            return self.last_tracked_frame.Twc.copy(), 0
        if getattr(self, "use_jax_pnp", False) or cv2 is None:
            return self._solve_pnp_jax(cur, matched)
        obj = np.asarray([m.position for _, m in matched], np.float64)
        img = np.asarray([cur.keypoints[i] for i, _ in matched], np.float64)
        K = np.array(
            [[self.camera.fx, 0, self.camera.cx], [0, self.camera.fy, self.camera.cy], [0, 0, 1]]
        )
        try:
            ok, rvec, tvec, inl = cv2.solvePnPRansac(
                obj, img, K, np.zeros(5), iterationsCount=100,
                reprojectionError=20.0, confidence=0.99,
            )
        except cv2.error:
            return self.last_tracked_frame.Twc.copy(), 0
        if not ok:
            return self.last_tracked_frame.Twc.copy(), 0
        Rcw, _ = cv2.Rodrigues(rvec)
        Twc = np.eye(4)
        Twc[:3, :3] = Rcw.T
        Twc[:3, 3] = -Rcw.T @ tvec[:, 0]
        return Twc, 0 if inl is None else len(inl)

    def _solve_pnp_jax(self, cur: Frame, matched):
        """Device-resident RANSAC PnP (backend/pnp.py)."""
        from airslam_tpu.backend.pnp import solve_pnp_ransac
        import jax as _jax

        N = max(128, 1 << (len(matched) - 1).bit_length())
        pts = np.zeros((N, 3))
        uv = np.zeros((N, 2))
        m = np.zeros(N, bool)
        for j, (i, mpt) in enumerate(matched):
            pts[j] = mpt.position
            uv[j] = cur.keypoints[i]
            m[j] = True
        R, t, inl, ok = solve_pnp_ransac(
            jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(m),
            self.map._intr, _jax.random.PRNGKey(cur.frame_id),
        )
        if not bool(ok):
            return self.last_tracked_frame.Twc.copy(), 0
        Twc = np.eye(4)
        Twc[:3, :3] = np.asarray(R).T
        Twc[:3, 3] = -np.asarray(R).T @ np.asarray(t)
        return Twc, int(np.asarray(inl).sum())

    def _pose_only(self, cur: Frame, matched, imu_ref: Optional[Frame] = None):
        """Pose-only GN via the batched backend (FrameOptimization equiv).
        When ``imu_ref`` is given, the problem includes the IMU factor to the
        last keyframe with that frame's states fixed (map_builder.cc:320-395):
        F=2 with frame 0 = fixed reference, frame 1 = current (pose, velocity
        and bias free)."""
        from airslam_tpu.backend import gn as _gn, windows as _w

        f = 2 if imu_ref is not None else 1
        cur_col = f - 1
        p = len(matched)
        P = max(64, 1 << (p - 1).bit_length())
        # match the jax compute dtype: f64 numpy leaves pay a downcast copy
        # inside every device_put when x64 is off (the CLI/deployment mode)
        dt = np.float64 if jax.config.jax_enable_x64 else np.float32
        points = np.zeros((P, 3), dt)
        obs = np.zeros((P, f, 3), dt)
        obs[..., 2] = -1.0
        mask = np.zeros((P, f), bool)
        for j, (i, mpt) in enumerate(matched):
            points[j] = mpt.position
            obs[j, cur_col] = cur.keypoint_position(i)
            mask[j, cur_col] = True

        Tcb = self.camera.Tcb
        Twb = cur.Twc @ Tcb
        Rwb_l = [Twb[:3, :3]]
        twb_l = [Twb[:3, 3]]
        vel_l = [cur.velocity]
        bg_l = [cur.bg]
        ba_l = [cur.ba]
        if imu_ref is not None:
            Twb0 = imu_ref.imu_pose(Tcb)
            Rwb_l.insert(0, Twb0[:3, :3])
            twb_l.insert(0, Twb0[:3, 3])
            vel_l.insert(0, imu_ref.velocity)
            bg_l.insert(0, imu_ref.bg)
            ba_l.insert(0, imu_ref.ba)
        fstates = _gn.FrameStates(
            Rwb=jnp.asarray(np.stack(Rwb_l)), twb=jnp.asarray(np.stack(twb_l)),
            vel=jnp.asarray(np.stack(vel_l)), bg=jnp.asarray(np.stack(bg_l)),
            ba=jnp.asarray(np.stack(ba_l)),
        )
        imu_factors = self._tracking_imu_factor() if imu_ref is not None else None
        # every leaf that does not change between frames is device_put ONCE
        # per (P, f) and reused via _replace — ~15 of the problem's ~20
        # leaves are constants, and per-leaf device_put glue dominated the
        # host cost of this per-frame assembly
        tmpl = getattr(self, "_pose_problem_tmpl", {}).get((P, f))
        if tmpl is None:
            pose_fixed = np.zeros(f, bool)
            vel_fixed = np.ones(f, bool)
            if imu_ref is not None:
                pose_fixed[0] = True
                vel_fixed[1] = False
            tmpl = _gn.BAProblem(
                frames=fstates,
                pose_fixed=jnp.asarray(pose_fixed),
                vel_fixed=jnp.asarray(vel_fixed),
                points=jnp.asarray(points),
                point_fixed=jnp.ones(P, bool),
                point_obs=jnp.asarray(obs),
                point_obs_mask=jnp.asarray(mask),
                lines=jnp.asarray(np.tile([1.0, 0, 0, 0, 1.0, 0], (1, 1))),
                line_fixed=jnp.ones(1, bool),
                line_obs=jnp.zeros((1, f, 8)),
                line_obs_stereo=jnp.zeros((1, f), bool),
                line_obs_mask=jnp.zeros((1, f), bool),
                line_obs_sigma=jnp.full((1, f), 0.5),
                Rwg=jnp.asarray(self.map.Rwg),
                gravity_free=jnp.asarray(0.0),
                imu=imu_factors,
                Rcb=jnp.asarray(Tcb[:3, :3]),
                tcb=jnp.asarray(Tcb[:3, 3]),
                g_value=self.map.g_value,
            )
            if not hasattr(self, "_pose_problem_tmpl"):
                self._pose_problem_tmpl = {}
            self._pose_problem_tmpl[(P, f)] = tmpl
            problem = tmpl
        else:
            problem = tmpl._replace(
                frames=fstates, points=jnp.asarray(points),
                point_obs=jnp.asarray(obs), point_obs_mask=jnp.asarray(mask),
                Rwg=jnp.asarray(self.map.Rwg), imu=imu_factors,
            )
        out, p_in, _, n_in = _w.pose_only_optimization(
            problem, self.map._intr, self.map.ba_config,
            vi_tracking=True if imu_factors is not None else None)
        n_in = int(n_in)
        if n_in > self.kf_config.lost_num_match:
            Twb_new = np.eye(4)
            Twb_new[:3, :3] = np.asarray(out.frames.Rwb[cur_col])
            Twb_new[:3, 3] = np.asarray(out.frames.twb[cur_col])
            cur.Twc = Twb_new @ np.linalg.inv(Tcb)
            if imu_ref is not None:
                cur.velocity = np.asarray(out.frames.vel[cur_col])
                cur.bg = np.asarray(out.frames.bg[cur_col])
                cur.ba = np.asarray(out.frames.ba[cur_col])
        p_in = np.asarray(p_in)[:, cur_col]
        flags = [(i, bool(p_in[j])) for j, (i, _) in enumerate(matched)]
        return n_in, flags

    def _tracking_imu_factor(self):
        """IMUFactors pytree (K=1, frames 0→1) from the live preintegration."""
        from airslam_tpu.backend import gn as _gn

        pre = self.preintegration
        st = pre.state
        cov = np.asarray(st.cov)
        info9 = np.linalg.inv(cov[:9, :9] + 1e-12 * np.eye(9))
        info9 = 0.5 * (info9 + info9.T)
        w, v = np.linalg.eigh(info9)
        info9 = v @ np.diag(np.clip(w, 0, None)) @ v.T
        walk = np.zeros((6, 6))
        walk[:3, :3] = np.linalg.inv(cov[9:12, 9:12] + 1e-12 * np.eye(3))
        walk[3:, 3:] = np.linalg.inv(cov[12:15, 12:15] + 1e-12 * np.eye(3))
        return _gn.IMUFactors(
            idx_i=jnp.asarray([0], jnp.int32), idx_j=jnp.asarray([1], jnp.int32),
            dR=jnp.asarray(np.asarray(st.dR)[None]),
            dV=jnp.asarray(np.asarray(st.dV)[None]),
            dP=jnp.asarray(np.asarray(st.dP)[None]),
            JRg=jnp.asarray(np.asarray(st.JRg)[None]),
            JVg=jnp.asarray(np.asarray(st.JVg)[None]),
            JVa=jnp.asarray(np.asarray(st.JVa)[None]),
            JPg=jnp.asarray(np.asarray(st.JPg)[None]),
            JPa=jnp.asarray(np.asarray(st.JPa)[None]),
            bg_lin=jnp.asarray(pre.bg[None]), ba_lin=jnp.asarray(pre.ba[None]),
            dT=jnp.asarray([float(st.dT)]),
            info=jnp.asarray(info9[None]), info_walk=jnp.asarray(walk[None]),
            mask=jnp.ones(1, bool),
        )

    # -- keyframe policy (map_builder.cc:429-466) ---------------------------

    def _keyframe_check(self, ref: Frame, cur: Frame, matches) -> int:
        """0 = this frame, 1 = next frame, 2 = none."""
        match_num = len(matches)
        if match_num < self.kf_config.min_num_match:
            return 0
        rate_thr = self.kf_config.tracking_point_rate
        parallax_thr = self.kf_config.tracking_parallax_rate
        if self.camera_uses_imu() and not self.map.imu_initialized:
            rate_thr *= 1.1
            parallax_thr *= 0.7

        n_ref = max(ref.valid_keypoint_count(), 1)
        n_cur = max(cur.valid_keypoint_count(), 1)
        if (
            match_num / n_ref < rate_thr
            or match_num / n_cur < rate_thr
            or match_num < self.kf_config.max_num_match
        ):
            return 1

        d = ref.keypoints[matches[:, 0]] - cur.keypoints[matches[:, 1]]
        avg_parallax = float((d * d).sum()) / match_num
        image_size = self.camera.image_height * self.camera.image_width
        if avg_parallax > image_size * parallax_thr * parallax_thr:
            return 1
        return 2

    def _insert_keyframe(self, frame: Frame):
        # this frame's own pose will keep being refined — make its trajectory
        # entry self-referential so it tracks the keyframe, not the old ref
        if self._trajectory and self._trajectory[-1][0] == frame.timestamp:
            self._trajectory[-1] = (frame.timestamp, frame, np.eye(4))
        self._assign_new_track_ids(frame)
        frame.previous_frame = self.last_keyframe
        if self.camera_uses_imu() and self.preintegration is not None:
            frame.preintegration = self.preintegration
            frame.bg = self.preintegration.bg.copy()
            frame.ba = self.preintegration.ba.copy()
            self.preintegration = None
        self.map.insert_keyframe(frame)
        self.last_keyframe = frame

    # ------------------------------------------------------------------

    @property
    def trajectory(self):
        """Full-rate (timestamp, Twc) list, composed against the reference
        keyframes' current (post-correction) poses."""
        return [(ts, ref.Twc @ rel) for ts, ref, rel in self._trajectory]

    def save_trajectory(self, path: str):
        from airslam_tpu.io.trajectory import save_tum

        save_tum(path, self.trajectory)

    def save_keyframe_trajectory(self, path: str):
        from airslam_tpu.io.trajectory import save_tum

        save_tum(path, self.map.keyframe_trajectory())


def _as_np_features(feats):
    """Accept FrameFeatures of numpy or device arrays."""
    import jax.tree_util as jtu

    return jtu.tree_map(np.asarray, feats)


class PipelinedRunner:
    """Double-buffered sequence runner — the TPU equivalent of the
    reference's 2-thread pipeline with bounded queues (map_builder.cc:33-49,
    feature thread ∥ tracking thread).

    JAX dispatch is asynchronous: ``detector.detect`` for frame t+1 is queued
    on the device *before* frame t's results are pulled to the host, so the
    device computes detection t+1 while the host runs matching bookkeeping,
    tracking and map maintenance for frame t. One frame of latency, same
    results as the sequential loop (test_pipelined_runner).
    """

    def __init__(self, builder: MapBuilder):
        self.builder = builder

    def run(self, dataset, max_frames: int = 0, progress=None):
        import jax.tree_util as jtu

        b = self.builder
        n = len(dataset) if max_frames <= 0 else min(len(dataset), max_frames)
        pending = None
        for i in range(n):
            ts, left_raw, right_raw, imu = dataset.get(i)
            left, right = b.rectify(left_raw, right_raw)
            feats_dev = b.detector.detect(np.stack([left, right]),
                                          detect_junctions=True)  # async
            if pending is not None:
                self._consume(pending)
                if progress is not None:
                    progress(i - 1)
            pending = (ts, feats_dev, imu)
        if pending is not None:
            self._consume(pending)
            if progress is not None:
                progress(n - 1)
        return n

    def _consume(self, item):
        import jax.tree_util as jtu

        ts, feats_dev, imu = item
        b = self.builder
        f0 = jtu.tree_map(lambda t: np.asarray(t[0]), feats_dev)
        f1 = jtu.tree_map(lambda t: np.asarray(t[1]), feats_dev)
        pairs, temporal = b._stereo_and_temporal(f0, f1)
        b.track_features(ts, f0, f1, pairs, imu, temporal_matches=temporal)
