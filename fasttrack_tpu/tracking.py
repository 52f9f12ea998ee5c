"""Tracking front-end: the per-frame state machine (src/Tracking.cc).

Host-side orchestration of the device kernels, mirroring the reference's
Track() control flow (Tracking.cc:1851-2392):

    GrabImage -> process_stereo_frame (device)            [ORB + stereo]
    -> TrackWithMotionModel (device search + pose opt)    [Tracking.cc:2911]
       fallback TrackReferenceKeyFrame                    [Tracking.cc:2777]
    -> TrackLocalMap (host frustum cull -> device search
       -> pose opt unless bypassed)                       [Tracking.cc:3042]
    -> NeedNewKeyFrame / CreateNewKeyFrame                [Tracking.cc:3193]
    -> RECENTLY_LOST / LOST handling + new map in Atlas   [Tracking.cc:2038]

The five offload toggles (KernelConfig) select device vs host per stage;
pose_optimization=False bypasses pose optimization in TrackLocalMap
(Tracking.cc:3080-3106, the FastTrack ablation mode).
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Optional

import numpy as np
import jax.numpy as jnp

from fasttrack_tpu.cameras.models import Camera
from fasttrack_tpu.frame_pipeline import process_stereo_frame
from fasttrack_tpu.geometry import SE3
from fasttrack_tpu.kernels import KernelConfig
from fasttrack_tpu.ops.extractor import OrbConfig
from fasttrack_tpu.ops.project_match import TH_HIGH, tlm_match, twm_match
from fasttrack_tpu.optim import pose_optimize
from fasttrack_tpu.slam_map import Atlas, KeyFrame, MapPoint
from fasttrack_tpu.stats import Stats


from fasttrack_tpu.nputils import orthonormalize as _orthonormalize


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    RECENTLY_LOST = 3
    LOST = 4


@dataclasses.dataclass
class TrackedFrame:
    """Host snapshot of one processed frame."""

    frame_id: int
    timestamp: float
    kp_uv: np.ndarray        # (N, 2)
    kp_level: np.ndarray
    kp_angle: np.ndarray
    desc_packed: np.ndarray
    desc_signed: np.ndarray
    u_right: np.ndarray
    depth: np.ndarray
    valid: np.ndarray
    R_cw: np.ndarray = None
    t_cw: np.ndarray = None
    mp_ids: np.ndarray = None

    def __post_init__(self):
        if self.mp_ids is None:
            self.mp_ids = np.full(len(self.kp_uv), -1, dtype=np.int64)

    def pose_wc(self):
        return self.R_cw.T, -self.R_cw.T @ self.t_cw


class Tracker:
    def __init__(
        self,
        camera: Camera,
        orb_config: OrbConfig,
        bf: float,
        atlas: Atlas,
        kernel_config: KernelConfig | None = None,
        stats: Stats | None = None,
        local_mapper=None,
        th_depth_factor: float = 40.0,
        min_frames_between_kf: int = 0,
        max_frames_between_kf: int = 20,
        monocular: bool = False,
    ):
        self.monocular = monocular
        self._init_reference: Optional[TrackedFrame] = None
        self.reloc_db = None      # KeyFrameDatabase (shared with loop closing)
        self.vocabulary = None
        self.camera = camera
        self.cfg = orb_config
        self.bf = float(bf)
        self.baseline = self.bf / float(np.asarray(camera.params)[0])
        self.th_depth = th_depth_factor * self.baseline
        self.atlas = atlas
        self.kcfg = kernel_config or KernelConfig()
        self.stats = stats or Stats()
        self.local_mapper = local_mapper
        self.state = TrackingState.NO_IMAGES_YET
        self.last_frame: Optional[TrackedFrame] = None
        self.velocity: Optional[tuple] = None  # (R, t) of Tcl (cur<-last)
        self.ref_kf_id: Optional[int] = None
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.min_frames = min_frames_between_kf
        self.max_frames = max_frames_between_kf
        self.n_inliers = 0
        self.lost_since: Optional[float] = None
        self.time_recently_lost = 5.0  # Tracking.cc:71
        self.trajectory: list = []     # (timestamp, R_cw, t_cw)

        self._scale_factors = np.asarray(
            [orb_config.scale_factor**l for l in range(orb_config.n_levels)],
            np.float32,
        )
        self._inv_sigma2 = 1.0 / (self._scale_factors**2)

    # ------------------------------------------------------------------ utils
    def _snapshot(self, fd, timestamp) -> TrackedFrame:
        kps = fd.kps
        return TrackedFrame(
            frame_id=self.frame_id,
            timestamp=timestamp,
            kp_uv=np.stack([np.asarray(kps.x), np.asarray(kps.y)], -1),
            kp_level=np.asarray(kps.level),
            kp_angle=np.asarray(kps.angle),
            desc_packed=np.asarray(kps.desc_packed),
            desc_signed=np.asarray(kps.desc_signed),
            u_right=np.asarray(fd.u_right),
            depth=np.asarray(fd.depth),
            valid=np.asarray(kps.valid),
        )

    def _unproject(self, frame: TrackedFrame, idx: np.ndarray) -> np.ndarray:
        """Stereo keypoints -> world points (host, float64)."""
        p = np.asarray(self.camera.params)
        fx, fy, cx, cy = p[:4]
        z = frame.depth[idx]
        x = (frame.kp_uv[idx, 0] - cx) / fx * z
        y = (frame.kp_uv[idx, 1] - cy) / fy * z
        Xc = np.stack([x, y, z], -1)
        R_wc, t_wc = frame.pose_wc()
        return Xc @ R_wc.T + t_wc

    # ------------------------------------------------------- main entry point
    def track_stereo(self, img_left, img_right, timestamp: float):
        t0 = time.perf_counter()
        fd = process_stereo_frame(
            jnp.asarray(img_left, jnp.float32),
            jnp.asarray(img_right, jnp.float32),
            self.cfg,
            jnp.float32(self.bf),
            jnp.float32(self.baseline),
        )
        return self._track_frame(fd, timestamp, t0)

    def track_rgbd(self, img, depth_map, timestamp: float):
        from fasttrack_tpu.frame_pipeline import process_rgbd_frame

        t0 = time.perf_counter()
        fd = process_rgbd_frame(
            jnp.asarray(img, jnp.float32),
            jnp.asarray(depth_map, jnp.float32),
            self.cfg,
            jnp.float32(self.bf),
        )
        return self._track_frame(fd, timestamp, t0)

    def track_monocular(self, img, timestamp: float):
        from fasttrack_tpu.frame_pipeline import process_mono_frame

        t0 = time.perf_counter()
        fd = process_mono_frame(jnp.asarray(img, jnp.float32), self.cfg)
        return self._track_frame(fd, timestamp, t0)

    def _track_frame(self, fd, timestamp: float, t0: float):
        frame = self._snapshot(fd, timestamp)
        self.stats.record("orb_extraction", (time.perf_counter() - t0) * 1e3)

        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            if self.monocular:
                self._monocular_initialization(frame)
            else:
                self._stereo_initialization(frame)
        else:
            self._track(frame)

        self.frame_id += 1
        self.last_frame = frame
        if frame.R_cw is not None:
            self.trajectory.append((timestamp, frame.R_cw.copy(), frame.t_cw.copy()))
        self.stats.record("tracking_total", (time.perf_counter() - t0) * 1e3)
        return (frame.R_cw, frame.t_cw) if frame.R_cw is not None else None

    # ------------------------------------------------- stereo initialization
    def _stereo_initialization(self, frame: TrackedFrame):
        """Tracking::StereoInitialization (Tracking.cc:2392): needs >500
        stereo-depth features; creates the first KF + map points."""
        good = frame.valid & (frame.depth > 0)
        if good.sum() < 100:
            self.state = TrackingState.NOT_INITIALIZED
            return
        frame.R_cw = np.eye(3)
        frame.t_cw = np.zeros(3)
        kf = self._make_keyframe(frame)
        m = self.atlas.current
        m.add_keyframe(kf)
        idx = np.where(good)[0]
        Xw = self._unproject(frame, idx)
        for i, x in zip(idx, Xw):
            mp = MapPoint(self.atlas.next_mp_id(), x, kf.kid, kf.kid)
            mp.add_observation(kf.kid, int(i))
            mp.desc_packed = frame.desc_packed[i]
            mp.desc_signed = frame.desc_signed[i]
            mp.update_normal_and_depth(
                {kf.kid: kf.center}, kf.center, int(frame.kp_level[i]),
                self.cfg.scale_factor, self.cfg.n_levels,
            )
            kf.mp_ids[i] = mp.mid
            frame.mp_ids[i] = mp.mid
            m.add_mappoint(mp)
        m.update_connections(kf)
        self.ref_kf_id = kf.kid
        self.last_kf_frame_id = self.frame_id
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf)
        self.state = TrackingState.OK

    # --------------------------------------------- monocular initialization
    def _monocular_initialization(self, frame: TrackedFrame):
        """Tracking::MonocularInitialization (Tracking.cc:2505) +
        CreateInitialMapMonocular (:2583): two-view reconstruction between a
        reference frame and the current frame; map scaled to median depth 1."""
        from fasttrack_tpu.ops.project_match import search_by_projection
        from fasttrack_tpu.optim.two_view import reconstruct_two_view

        n_min = 100
        if self._init_reference is None or frame.valid.sum() < n_min:
            self._init_reference = frame if frame.valid.sum() >= n_min else None
            self.state = TrackingState.NOT_INITIALIZED
            return
        ref = self._init_reference
        # SearchForInitialization (ORBmatcher.cc:747): level-0 features,
        # window radius 100, ratio 0.9.
        lvl0_ref = ref.valid & (ref.kp_level == 0)
        lvl0_cur = frame.valid & (frame.kp_level == 0)
        res = search_by_projection(
            jnp.asarray(ref.kp_uv), jnp.asarray(ref.desc_signed),
            jnp.full(len(ref.kp_uv), 100.0),
            jnp.zeros(len(ref.kp_uv), jnp.int32),
            jnp.zeros(len(ref.kp_uv), jnp.int32),
            jnp.asarray(lvl0_ref),
            jnp.asarray(frame.kp_uv), jnp.asarray(frame.desc_signed),
            jnp.asarray(frame.kp_level.astype(np.int32)),
            jnp.asarray(lvl0_cur),
            ratio=0.9,
        )
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        if ok.sum() < n_min:
            self._init_reference = frame  # slide the reference forward
            return
        i1 = np.where(ok)[0]
        i2 = idx[i1]
        p = np.asarray(self.camera.params)
        K = np.array([[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1.0]])
        tv = reconstruct_two_view(
            ref.kp_uv[i1].astype(np.float32), frame.kp_uv[i2].astype(np.float32), K
        )
        if not tv.success:
            return
        # Scale: median depth -> 1 (CreateInitialMapMonocular).
        good = tv.good_mask
        med_z = float(np.median(tv.points3d[good, 2]))
        if med_z <= 0:
            return
        scale = 1.0 / med_z
        X = tv.points3d * scale

        ref.R_cw = np.eye(3)
        ref.t_cw = np.zeros(3)
        frame.R_cw = tv.R
        frame.t_cw = tv.t * scale
        m = self.atlas.current
        kf1 = self._make_keyframe(ref)
        m.add_keyframe(kf1)
        kf2 = self._make_keyframe(frame)
        m.add_keyframe(kf2)
        for k in np.where(good)[0]:
            a, b = int(i1[k]), int(i2[k])
            mp = MapPoint(self.atlas.next_mp_id(), X[k], kf2.kid, kf1.kid)
            mp.add_observation(kf1.kid, a)
            mp.add_observation(kf2.kid, b)
            mp.desc_packed = frame.desc_packed[b]
            mp.desc_signed = frame.desc_signed[b]
            mp.update_normal_and_depth(
                {kf1.kid: kf1.center, kf2.kid: kf2.center}, kf2.center,
                int(frame.kp_level[b]), self.cfg.scale_factor, self.cfg.n_levels,
            )
            kf1.mp_ids[a] = mp.mid
            kf2.mp_ids[b] = mp.mid
            frame.mp_ids[b] = mp.mid
            m.add_mappoint(mp)
        m.update_connections(kf1)
        m.update_connections(kf2)
        self.ref_kf_id = kf2.kid
        self.last_kf_frame_id = self.frame_id
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf1)
            self.local_mapper.insert_keyframe(kf2)
        self._init_reference = None
        self.state = TrackingState.OK

    def _make_keyframe(self, frame: TrackedFrame) -> KeyFrame:
        return KeyFrame(
            self.atlas.next_kf_id(), frame.frame_id, frame.timestamp,
            frame.R_cw, frame.t_cw, frame.kp_uv, frame.kp_level, frame.kp_angle,
            frame.desc_packed, frame.desc_signed, frame.u_right, frame.depth,
            frame.valid,
        )

    # ------------------------------------------------------------- tracking
    def _track(self, frame: TrackedFrame):
        m = self.atlas.current
        with m.lock:
            ok = False
            if self.state == TrackingState.OK:
                if self.velocity is not None:
                    t0 = time.perf_counter()
                    ok = self._track_with_motion_model(frame)
                    self.stats.record("twm", (time.perf_counter() - t0) * 1e3)
                if not ok:
                    t0 = time.perf_counter()
                    ok = self._track_reference_keyframe(frame)
                    self.stats.record("trk", (time.perf_counter() - t0) * 1e3)
            elif self.state == TrackingState.RECENTLY_LOST:
                ok = self._track_reference_keyframe(frame)
                if not ok:
                    ok = self._relocalization(frame)

            if ok:
                t0 = time.perf_counter()
                ok = self._track_local_map(frame)
                self.stats.record("tlm", (time.perf_counter() - t0) * 1e3)

            if ok:
                self.state = TrackingState.OK
                self.lost_since = None
                # velocity = Tcw_cur * Twc_last
                R_wl, t_wl = self.last_frame.pose_wc()
                self.velocity = (
                    _orthonormalize(frame.R_cw @ R_wl),
                    frame.R_cw @ t_wl + frame.t_cw,
                )
                self._update_found_counters(frame)
                if self._need_new_keyframe(frame):
                    self._create_new_keyframe(frame)
            else:
                if self.state == TrackingState.OK:
                    self.state = TrackingState.RECENTLY_LOST
                    self.lost_since = frame.timestamp
                elif (
                    self.state == TrackingState.RECENTLY_LOST
                    and self.lost_since is not None
                    and frame.timestamp - self.lost_since > self.time_recently_lost
                ):
                    self.state = TrackingState.LOST
                    self._handle_lost()
                self.velocity = None
                # keep last pose as estimate
                if self.last_frame.R_cw is not None:
                    frame.R_cw = self.last_frame.R_cw.copy()
                    frame.t_cw = self.last_frame.t_cw.copy()
            self.stats.record_count("track_ok", int(ok))

    def _handle_lost(self):
        """Tracking.cc:2071-2089: abandon small maps, else start a fresh map
        in the Atlas (to be merged back by loop closing)."""
        m = self.atlas.current
        if m.n_keyframes() <= 10:
            m.keyframes.clear()
            m.mappoints.clear()
        self.atlas.create_new_map()
        self.state = TrackingState.NOT_INITIALIZED
        self.ref_kf_id = None
        self.velocity = None

    # ------------------------------------------- device matching sub-routines
    def _gather_map_points(self, mids: np.ndarray, m):
        """Return (positions, signed descs, valid) padded arrays for ids."""
        pos = np.zeros((len(mids), 3), np.float32)
        desc = np.zeros((len(mids), 256), np.int8)
        ok = np.zeros(len(mids), bool)
        for j, mid in enumerate(mids):
            mp = m.mappoints.get(int(mid))
            if mp is None or mp.bad or mp.desc_signed is None:
                continue
            pos[j] = mp.position
            desc[j] = mp.desc_signed
            ok[j] = True
        return pos, desc, ok

    def _track_with_motion_model(self, frame: TrackedFrame) -> bool:
        """Tracking.cc:2911 + the PoseEstimationKernel device search."""
        m = self.atlas.current
        last = self.last_frame
        R_pred = self.velocity[0] @ last.R_cw
        t_pred = self.velocity[0] @ last.t_cw + self.velocity[1]

        has_mp = last.mp_ids >= 0
        if has_mp.sum() < 10:
            return False
        mids = last.mp_ids.copy()
        pos, desc, okq = self._gather_map_points(mids, m)
        okq &= has_mp

        # Project with predicted pose (host: cheap; device does matching).
        Xc = pos @ R_pred.T.astype(np.float32) + t_pred.astype(np.float32)
        p = np.asarray(self.camera.params)
        z = np.maximum(Xc[:, 2], 1e-6)
        u = p[0] * Xc[:, 0] / z + p[2]
        v = p[1] * Xc[:, 1] / z + p[3]
        in_img = (
            (Xc[:, 2] > 0) & (u >= 0) & (u < self.camera.width)
            & (v >= 0) & (v < self.camera.height)
        )
        okq &= in_img
        th = 7.0  # stereo radius (ORBmatcher th=7 for stereo/RGBD)
        radius = th * self._scale_factors[last.kp_level]
        lvl = last.kp_level
        for widen in (1.0, 2.0):  # retry with doubled window (Tracking.cc:2964)
            idx, keep = twm_match(
                jnp.asarray(np.stack([u, v], -1)),
                jnp.asarray(desc),
                jnp.asarray(radius * widen),
                jnp.asarray(np.maximum(lvl - 1, 0).astype(np.int32)),
                jnp.asarray(np.minimum(lvl + 1, self.cfg.n_levels - 1).astype(np.int32)),
                jnp.asarray(okq),
                jnp.asarray(frame.kp_uv),
                jnp.asarray(frame.desc_signed),
                jnp.asarray(frame.kp_level.astype(np.int32)),
                jnp.asarray(frame.valid),
                jnp.asarray(last.kp_angle),
                jnp.asarray(frame.kp_angle),
            )
            keep_np = np.asarray(keep)
            n = int(keep_np.sum())
            if n >= 20:
                break
        if n < 20:
            return False

        idx_np = np.asarray(idx)
        frame.mp_ids[:] = -1
        frame.mp_ids[idx_np[keep_np]] = mids[keep_np]
        return self._optimize_frame_pose(frame, R_pred, t_pred, min_inliers=10)

    def _track_reference_keyframe(self, frame: TrackedFrame) -> bool:
        """Tracking.cc:2777: descriptor match to the reference KF (the
        reference uses BoW-accelerated matching; dense MXU Hamming needs no
        acceleration structure) + pose optimization."""
        m = self.atlas.current
        kf = m.keyframes.get(self.ref_kf_id) if self.ref_kf_id is not None else None
        if kf is None:
            return False
        has_mp = kf.mp_ids >= 0
        if has_mp.sum() < 15:
            return False
        pos, desc, okq = self._gather_map_points(kf.mp_ids, m)
        okq &= has_mp
        # Brute-force ratio matching (SearchByBoW semantics, ratio 0.7).
        from fasttrack_tpu.ops.stereo_match import match_fisheye

        res = match_fisheye(
            jnp.asarray(desc), jnp.asarray(okq),
            jnp.asarray(frame.desc_signed), jnp.asarray(frame.valid),
            ratio=0.7, max_dist=TH_HIGH,
        )
        keep = np.asarray(res.valid)
        if keep.sum() < 15:
            return False
        frame.mp_ids[:] = -1
        frame.mp_ids[np.asarray(res.idx_right)[keep]] = kf.mp_ids[keep]
        R0 = self.last_frame.R_cw if self.last_frame.R_cw is not None else kf.R_cw
        t0 = self.last_frame.t_cw if self.last_frame.t_cw is not None else kf.t_cw
        return self._optimize_frame_pose(frame, R0, t0, min_inliers=10)

    def _optimize_frame_pose(self, frame, R0, t0, min_inliers=10) -> bool:
        m = self.atlas.current
        bound = np.where(frame.mp_ids >= 0)[0]
        if len(bound) < min_inliers:
            return False
        N = len(frame.mp_ids)
        Xw = np.zeros((N, 3), np.float32)
        ok = np.zeros(N, bool)
        for i in bound:
            mp = m.mappoints.get(int(frame.mp_ids[i]))
            if mp is not None and not mp.bad:
                Xw[i] = mp.position
                ok[i] = True
        res = pose_optimize(
            self.camera,
            jnp.float32(self.bf),
            SE3(jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32)),
            jnp.asarray(Xw),
            jnp.asarray(frame.kp_uv),
            jnp.asarray(frame.u_right),
            jnp.asarray(self._inv_sigma2[frame.kp_level]),
            jnp.asarray(ok),
        )
        inl = np.asarray(res.inliers)
        self.n_inliers = int(res.n_inliers)
        # unbind outliers (Tracking.cc:2996-3038)
        frame.mp_ids[~inl] = -1
        if self.n_inliers < min_inliers:
            return False
        frame.R_cw = _orthonormalize(np.asarray(res.pose.R, np.float64))
        frame.t_cw = np.asarray(res.pose.t, np.float64)
        return True

    # -------------------------------------------------------- relocalization
    def _relocalization(self, frame: TrackedFrame) -> bool:
        """Tracking::Relocalization (Tracking.cc:3798): BoW candidate
        keyframes -> descriptor matching -> RANSAC PnP -> pose refinement.
        Requires a place-recognition database (self.reloc_db, shared with
        loop closing)."""
        if self.reloc_db is None or self.vocabulary is None:
            return False
        from fasttrack_tpu.bow.vocabulary import quantize
        from fasttrack_tpu.ops.stereo_match import match_fisheye
        from fasttrack_tpu.optim.pnp import ransac_pnp

        m = self.atlas.current
        _, bow = quantize(self.vocabulary, frame.desc_signed, frame.valid)
        cands = self.reloc_db.detect_relocalization_candidates(bow, n_best=5)
        p = np.asarray(self.camera.params)
        for kid in cands:
            kf = m.keyframes.get(kid)
            if kf is None:
                continue
            has_mp = kf.mp_ids >= 0
            if has_mp.sum() < 15:
                continue
            pos, desc, okq = self._gather_map_points(kf.mp_ids, m)
            okq &= has_mp
            res = match_fisheye(
                jnp.asarray(desc), jnp.asarray(okq),
                jnp.asarray(frame.desc_signed), jnp.asarray(frame.valid),
                ratio=0.75,
            )
            keep = np.asarray(res.valid)
            if keep.sum() < 15:
                continue
            idxf = np.asarray(res.idx_right)[keep]
            X = pos[keep]
            uv = frame.kp_uv[idxf]
            rays = np.stack(
                [(uv[:, 0] - p[2]) / p[0], (uv[:, 1] - p[3]) / p[1],
                 np.ones(len(uv))], -1,
            )
            sig2 = (1.0 / self._inv_sigma2)[frame.kp_level[idxf]]
            pnp = ransac_pnp(X.astype(np.float64), rays, sig2, float(p[0]))
            if not pnp.success:
                continue
            frame.mp_ids[:] = -1
            frame.mp_ids[idxf[pnp.inliers]] = kf.mp_ids[keep][pnp.inliers]
            if self._optimize_frame_pose(frame, pnp.R_cw, pnp.t_cw, min_inliers=20):
                self.ref_kf_id = kid
                return True
        return False

    # ---------------------------------------------------------- local map
    def _local_map_ids(self, frame: TrackedFrame):
        """UpdateLocalKeyFrames/Points (Tracking.cc:3571-3797): KFs observing
        current points + their covisible neighbors; then all their points."""
        m = self.atlas.current
        kf_counter: dict[int, int] = {}
        for mid in frame.mp_ids:
            if mid < 0:
                continue
            mp = m.mappoints.get(int(mid))
            if mp is None or mp.bad:
                continue
            for kf_id in mp.observations:
                kf_counter[kf_id] = kf_counter.get(kf_id, 0) + 1
        if not kf_counter:
            return [], np.empty(0, np.int64)
        local_kfs = set(kf_counter)
        for kf_id in list(local_kfs)[:80]:
            kf = m.keyframes.get(kf_id)
            if kf is None:
                continue
            for nid in kf.best_covisible(10):
                local_kfs.add(nid)
            if len(local_kfs) > 80:
                break
        self.ref_kf_id = max(kf_counter, key=lambda k: kf_counter[k])
        mp_ids = set()
        for kf_id in local_kfs:
            kf = m.keyframes.get(kf_id)
            if kf is None:
                continue
            for mid in kf.mp_ids:
                if mid >= 0:
                    mp_ids.add(int(mid))
        return list(local_kfs), np.fromiter(mp_ids, np.int64)

    def _track_local_map(self, frame: TrackedFrame) -> bool:
        m = self.atlas.current
        _, mp_ids = self._local_map_ids(frame)
        if len(mp_ids) == 0:
            return False

        # Host frustum cull (Frame::isInFrustum — the reference also does
        # this on host, Tracking.cc:3472).
        P_CAP = 4096
        pos = np.zeros((P_CAP, 3), np.float32)
        desc = np.zeros((P_CAP, 256), np.int8)
        okq = np.zeros(P_CAP, bool)
        levels = np.zeros(P_CAP, np.int32)
        mids_arr = np.full(P_CAP, -1, np.int64)
        already = set(int(x) for x in frame.mp_ids[frame.mp_ids >= 0])
        j = 0
        R_wc, t_wc = frame.pose_wc()
        for mid in mp_ids:
            if j >= P_CAP:
                break
            mp = m.mappoints.get(int(mid))
            if mp is None or mp.bad or mp.desc_signed is None:
                continue
            mp.n_visible += 0  # placeholder; updated below when in frustum
            if int(mid) in already:
                continue
            pos[j] = mp.position
            desc[j] = mp.desc_signed
            mids_arr[j] = mid
            okq[j] = True
            j += 1
        if j == 0:
            return self.n_inliers >= 30

        p = np.asarray(self.camera.params)
        Xc = (pos - t_wc.astype(np.float32)) @ R_wc.astype(np.float32)
        z = Xc[:, 2]
        safe_z = np.maximum(z, 1e-6)
        u = p[0] * Xc[:, 0] / safe_z + p[2]
        v = p[1] * Xc[:, 1] / safe_z + p[3]
        dist = np.linalg.norm(Xc, axis=1)
        in_frustum = (
            okq & (z > 0.1)
            & (u >= 0) & (u < self.camera.width)
            & (v >= 0) & (v < self.camera.height)
        )
        # scale band + viewing angle checks
        for jj in np.where(in_frustum)[0]:
            mp = m.mappoints.get(int(mids_arr[jj]))
            if mp is None:
                in_frustum[jj] = False
                continue
            if not (0.8 * mp.min_distance <= dist[jj] <= 1.2 * mp.max_distance):
                in_frustum[jj] = False
                continue
            pn = mp.normal
            view = (pos[jj] - t_wc) / max(dist[jj], 1e-9)
            if pn @ view < 0.5:
                in_frustum[jj] = False
                continue
            mp.n_visible += 1
            mp.last_frame_seen = frame.frame_id
            levels[jj] = mp.predict_scale(
                float(dist[jj]), self.cfg.scale_factor, self.cfg.n_levels
            )

        okq &= in_frustum
        radius = 4.0 * self._scale_factors[levels]  # th=1? reference r=th*radius(viewCos)
        taken = frame.mp_ids >= 0
        idx, keep = tlm_match(
            jnp.asarray(np.stack([u, v], -1)),
            jnp.asarray(desc),
            jnp.asarray(radius.astype(np.float32)),
            jnp.asarray(np.maximum(levels - 1, 0)),
            jnp.asarray(levels),
            jnp.asarray(okq),
            jnp.asarray(frame.kp_uv),
            jnp.asarray(frame.desc_signed),
            jnp.asarray(frame.kp_level.astype(np.int32)),
            jnp.asarray(frame.valid),
            jnp.asarray(taken),
        )
        keep_np = np.asarray(keep)
        idx_np = np.asarray(idx)
        frame.mp_ids[idx_np[keep_np]] = mids_arr[keep_np]

        # Pose optimization — bypassed when the toggle is off
        # (Tracking.cc:3080-3106).
        if self.kcfg.pose_optimization:
            ok = self._optimize_frame_pose(frame, frame.R_cw, frame.t_cw, min_inliers=15)
            if not ok:
                return False
        else:
            self.n_inliers = int((frame.mp_ids >= 0).sum())
        return self.n_inliers >= 20

    def _update_found_counters(self, frame: TrackedFrame):
        m = self.atlas.current
        for mid in frame.mp_ids:
            if mid >= 0:
                mp = m.mappoints.get(int(mid))
                if mp is not None:
                    mp.n_found += 1

    # ------------------------------------------------------------ keyframes
    def _need_new_keyframe(self, frame: TrackedFrame) -> bool:
        """Tracking.cc:3193 (simplified): reference ratio + frame spacing."""
        m = self.atlas.current
        kf = m.keyframes.get(self.ref_kf_id)
        if kf is None:
            return False
        min_obs = 3 if m.n_keyframes() > 2 else 2
        ref_matches = kf.tracked_map_points(m.mappoints, min_obs)
        if ref_matches == 0:
            # Fresh map: init-KF points have a single observation, which
            # would disable the inlier-ratio trigger entirely and let the
            # map go stale (observed: appearance drift then collapse).
            ref_matches = kf.tracked_map_points(m.mappoints, 1)
        # close stereo points tracked vs could-be-created
        close_tracked = int(
            ((frame.depth > 0) & (frame.depth < self.th_depth) & (frame.mp_ids >= 0)).sum()
        )
        close_new = int(
            ((frame.depth > 0) & (frame.depth < self.th_depth) & (frame.mp_ids < 0)).sum()
        )
        need_insert_close = (close_tracked < 100) and (close_new > 70)
        # mono needs denser keyframes (reference thRefRatio=0.9 monocular)
        th_ref = 0.9 if self.monocular else (0.75 if m.n_keyframes() > 2 else 0.4)
        c1a = self.frame_id >= self.last_kf_frame_id + self.max_frames
        c1b = self.frame_id >= self.last_kf_frame_id + self.min_frames
        c2 = (
            self.n_inliers < ref_matches * th_ref or need_insert_close
        ) and self.n_inliers > 15
        return (c1a or (c1b and need_insert_close)) or c2

    def _create_new_keyframe(self, frame: TrackedFrame):
        """Tracking.cc:3345: new KF + stereo map points for close features."""
        m = self.atlas.current
        kf = self._make_keyframe(frame)
        kf.mp_ids = frame.mp_ids.copy()
        m.add_keyframe(kf)
        for i, mid in enumerate(frame.mp_ids):
            if mid >= 0:
                mp = m.mappoints.get(int(mid))
                if mp is not None and not mp.bad:
                    mp.add_observation(kf.kid, i)
        # create close stereo points (sorted by depth, cap ~100 beyond th)
        cand = np.where(frame.valid & (frame.depth > 0) & (frame.mp_ids < 0))[0]
        cand = cand[np.argsort(frame.depth[cand])]
        created = 0
        for i in cand:
            if frame.depth[i] > self.th_depth and created > 100:
                break
            Xw = self._unproject(frame, np.asarray([i]))[0]
            mp = MapPoint(self.atlas.next_mp_id(), Xw, kf.kid, kf.kid)
            mp.add_observation(kf.kid, int(i))
            mp.desc_packed = frame.desc_packed[i]
            mp.desc_signed = frame.desc_signed[i]
            mp.update_normal_and_depth(
                {kf.kid: kf.center}, kf.center, int(frame.kp_level[i]),
                self.cfg.scale_factor, self.cfg.n_levels,
            )
            kf.mp_ids[i] = mp.mid
            frame.mp_ids[i] = mp.mid
            m.add_mappoint(mp)
            created += 1
        m.update_connections(kf)
        self.ref_kf_id = kf.kid
        self.last_kf_frame_id = self.frame_id
        if self.local_mapper is not None:
            self.local_mapper.insert_keyframe(kf)
