"""Local mapping back-end (src/LocalMapping.cc).

Per inserted keyframe (LocalMapping::Run loop, LocalMapping.cc:64-282):
recent-map-point culling, new-point triangulation (stereo points come from
the tracker; epipolar triangulation adds mono points), duplicate fusion,
local BA over the covisibility window (device Schur-complement solver), and
keyframe culling.

Runs either synchronously (deterministic tests) or as a background thread
with the same queue/abort protocol as the reference.
"""

from __future__ import annotations

import queue
import threading

import numpy as np
import jax.numpy as jnp

from fasttrack_tpu.cameras.models import Camera
from fasttrack_tpu.geometry import SE3
from fasttrack_tpu.optim import BAProblem, local_bundle_adjustment
from fasttrack_tpu.slam_map import Atlas, KeyFrame

# BA window capacities (fixed shapes -> one XLA compile).
BA_MAX_KFS = 16
BA_MAX_POINTS = 2048


class LocalMapper:
    def __init__(self, atlas: Atlas, camera: Camera, bf: float,
                 scale_factor: float = 1.2, n_levels: int = 8,
                 run_async: bool = False, loop_closer=None):
        self.atlas = atlas
        self.camera = camera
        self.bf = float(bf)
        self.scale_factor = scale_factor
        self.n_levels = n_levels
        self.inv_sigma2 = 1.0 / (scale_factor ** (2 * np.arange(n_levels)))
        self.loop_closer = loop_closer
        self.recent_mp_ids: list[tuple[int, int]] = []  # (mp_id, first_kf)
        self.run_async = run_async
        self.abort_ba = False
        self._queue: queue.Queue = queue.Queue()
        self._stop = False
        self._idle = threading.Event()
        self._idle.set()
        self._thread = None
        if run_async:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    # ---------------------------------------------------------------- public
    def insert_keyframe(self, kf: KeyFrame):
        if self.run_async:
            self.abort_ba = True  # interrupt BA like mbAbortBA
            self._queue.put(kf)
        else:
            self.process_keyframe(kf)

    def queue_size(self) -> int:
        return self._queue.qsize()

    def is_idle(self) -> bool:
        return self._idle.is_set() and self._queue.empty()

    def stop(self):
        self._stop = True
        if self._thread is not None:
            self._queue.put(None)
            self._thread.join(timeout=10)

    def _run(self):
        while not self._stop:
            kf = self._queue.get()
            if kf is None:
                break
            self._idle.clear()
            try:
                with self.atlas.current.lock:
                    self.process_keyframe(kf)
            finally:
                self._idle.set()

    # ------------------------------------------------------------ processing
    def process_keyframe(self, kf: KeyFrame):
        m = self.atlas.current
        if kf.kid not in m.keyframes:
            return
        self.abort_ba = False
        self._track_new_points(kf)
        self._cull_recent_mappoints(kf)
        self._create_new_mappoints(kf)
        if m.n_keyframes() > 2:
            self._local_ba(kf)
            self._cull_keyframes(kf)
        if self.loop_closer is not None and kf.kid in m.keyframes:
            self.loop_closer.insert_keyframe(kf)

    def _track_new_points(self, kf: KeyFrame):
        """Register only map points CREATED at this keyframe for the culling
        grace window (the reference's mlpRecentAddedMapPoints holds newly
        triangulated points, not re-observed ones, LocalMapping.cc:388)."""
        m = self.atlas.current
        for i, mid in enumerate(kf.mp_ids):
            if mid < 0:
                continue
            mp = m.mappoints.get(int(mid))
            if (
                mp is not None
                and mp.first_kf_id == kf.kid
                and kf.kid != m.init_kf_id  # init points are not probationary
            ):
                self.recent_mp_ids.append((int(mid), kf.kid))

    def _cull_recent_mappoints(self, kf: KeyFrame):
        """MapPointCulling (LocalMapping.cc:346): drop points with poor
        found/visible ratio or too few observations after a grace period."""
        m = self.atlas.current
        survivors = []
        for mid, first_kf in self.recent_mp_ids:
            mp = m.mappoints.get(mid)
            if mp is None or mp.bad:
                continue
            age = kf.kid - first_kf
            if mp.found_ratio() < 0.25:
                m.erase_mappoint(mid)
            elif age >= 2 and mp.n_obs() <= 2:
                m.erase_mappoint(mid)
            elif age >= 3:
                continue  # graduated
            else:
                survivors.append((mid, first_kf))
        self.recent_mp_ids = survivors

    # ------------------------------------------------- new point creation
    def _create_new_mappoints(self, kf: KeyFrame, n_neighbors: int = 10):
        """Epipolar triangulation of unmatched features with covisible
        keyframes (LocalMapping::CreateNewMapPoints, LocalMapping.cc:388).
        The stereo tracker also creates points from depth; this adds the
        far/mono points and is the ONLY source of points in monocular mode."""
        import jax.numpy as jnp

        from fasttrack_tpu.cameras.stereo import triangulate_two_view
        from fasttrack_tpu.geometry import SE3, se3_compose, se3_inverse
        from fasttrack_tpu.ops.project_match import epipolar_match
        from fasttrack_tpu.slam_map import MapPoint

        m = self.atlas.current
        p = np.asarray(self.camera.params)
        fx, fy, cx, cy = p[:4]
        Kmat = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        Kinv = np.linalg.inv(Kmat)
        sigma2 = self.inv_sigma2  # note: inv; variance = 1/inv
        created = 0
        for nid in kf.best_covisible(n_neighbors):
            nb = m.keyframes.get(nid)
            if nb is None:
                continue
            # baseline check (LocalMapping.cc:437): skip near-identical views
            baseline = np.linalg.norm(kf.center - nb.center)
            if baseline < 0.01:
                continue
            # fundamental F12 with x2^T F x1 = 0 (1 = neighbor, 2 = current):
            R1, t1 = nb.R_cw, nb.t_cw
            R2, t2 = kf.R_cw, kf.t_cw
            R21 = R2 @ R1.T
            t21 = t2 - R21 @ t1
            tx = np.array([[0, -t21[2], t21[1]], [t21[2], 0, -t21[0]], [-t21[1], t21[0], 0]])
            E = tx @ R21
            F12 = Kinv.T @ E @ Kinv

            free1 = (nb.mp_ids < 0) & nb.valid
            free2 = (kf.mp_ids < 0) & kf.valid
            var2 = (1.0 / sigma2)[kf.kp_level]
            idx2, keep = epipolar_match(
                jnp.asarray(nb.kp_uv), jnp.asarray(nb.desc_signed), jnp.asarray(free1),
                jnp.asarray(kf.kp_uv), jnp.asarray(kf.desc_signed), jnp.asarray(free2),
                jnp.asarray(F12.astype(np.float32)),
                jnp.asarray(var2.astype(np.float32)),
            )
            keep = np.asarray(keep)
            idx2 = np.asarray(idx2)
            if not keep.any():
                continue
            i1 = np.where(keep)[0]
            i2 = idx2[i1]
            # triangulate in neighbor frame then move to world
            r1 = np.stack([(nb.kp_uv[i1, 0] - cx) / fx, (nb.kp_uv[i1, 1] - cy) / fy,
                           np.ones(len(i1))], -1)
            r2 = np.stack([(kf.kp_uv[i2, 0] - cx) / fx, (kf.kp_uv[i2, 1] - cy) / fy,
                           np.ones(len(i2))], -1)
            T21 = SE3(jnp.asarray(R21.astype(np.float32)), jnp.asarray(t21.astype(np.float32)))
            X1 = np.asarray(triangulate_two_view(
                jnp.asarray(r1.astype(np.float32)), jnp.asarray(r2.astype(np.float32)), T21
            ))
            # validations: finite, in front, parallax, reprojection
            z1 = X1[:, 2]
            X2 = X1 @ R21.T + t21
            z2 = X2[:, 2]
            d1 = X1 / np.maximum(np.linalg.norm(X1, axis=1, keepdims=True), 1e-9)
            C2in1 = -R21.T @ t21
            v2 = X1 - C2in1
            d2 = v2 / np.maximum(np.linalg.norm(v2, axis=1, keepdims=True), 1e-9)
            cosp = np.sum(d1 * d2, axis=1)
            pr1 = (X1 @ Kmat.T)
            pr1 = pr1[:, :2] / np.maximum(pr1[:, 2:], 1e-9)
            pr2 = (X2 @ Kmat.T)
            pr2 = pr2[:, :2] / np.maximum(pr2[:, 2:], 1e-9)
            e1 = ((pr1 - nb.kp_uv[i1]) ** 2).sum(1) * sigma2[nb.kp_level[i1]]
            e2 = ((pr2 - kf.kp_uv[i2]) ** 2).sum(1) * sigma2[kf.kp_level[i2]]
            good = (
                np.isfinite(X1).all(1) & (z1 > 0) & (z2 > 0)
                & (cosp < 0.9998) & (e1 < 5.991) & (e2 < 5.991)
            )
            R1w = nb.R_cw.T
            t1w = nb.center
            for k in np.where(good)[0]:
                a, b = int(i1[k]), int(i2[k])
                if nb.mp_ids[a] >= 0 or kf.mp_ids[b] >= 0:
                    continue
                Xw = R1w @ X1[k] + t1w
                mp = MapPoint(self.atlas.next_mp_id(), Xw, kf.kid, kf.kid)
                mp.add_observation(nb.kid, a)
                mp.add_observation(kf.kid, b)
                mp.desc_packed = kf.desc_packed[b]
                mp.desc_signed = kf.desc_signed[b]
                mp.update_normal_and_depth(
                    {nb.kid: nb.center, kf.kid: kf.center}, kf.center,
                    int(kf.kp_level[b]), self.scale_factor, self.n_levels,
                )
                nb.mp_ids[a] = mp.mid
                kf.mp_ids[b] = mp.mid
                m.add_mappoint(mp)
                self.recent_mp_ids.append((mp.mid, kf.kid))
                created += 1
        return created

    # ------------------------------------------------------------- local BA
    def _local_ba(self, kf: KeyFrame):
        """Assemble the covisibility window into a fixed-shape BAProblem and
        run the device Schur solver (Optimizer.cc:1116 semantics)."""
        m = self.atlas.current
        local_ids = [kf.kid] + kf.best_covisible(BA_MAX_KFS - 1)
        local_ids = [k for k in local_ids if k in m.keyframes]
        local_set = set(local_ids)

        # Collect window points.
        mp_ids = []
        seen = set()
        for kid in local_ids:
            for mid in m.keyframes[kid].mp_ids:
                if mid >= 0 and int(mid) not in seen:
                    mp = m.mappoints.get(int(mid))
                    if mp is not None and not mp.bad:
                        seen.add(int(mid))
                        mp_ids.append(int(mid))
        mp_ids = mp_ids[:BA_MAX_POINTS]

        # Fixed frontier: KFs outside the window observing these points.
        fixed_ids = []
        for mid in mp_ids:
            for kid in m.mappoints[mid].observations:
                if kid not in local_set and kid in m.keyframes:
                    if kid not in fixed_ids:
                        fixed_ids.append(kid)
            if len(local_ids) + len(fixed_ids) >= BA_MAX_KFS:
                break
        all_kf_ids = (local_ids + fixed_ids)[:BA_MAX_KFS]
        # Gauge: if no fixed frontier, fix the oldest KF in the window.
        n_fixed = len(all_kf_ids) - len([k for k in all_kf_ids if k in local_set])
        K = BA_MAX_KFS
        L = BA_MAX_POINTS

        kf_index = {kid: j for j, kid in enumerate(all_kf_ids)}
        R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        t = np.zeros((K, 3), np.float32)
        cam_free = np.zeros(K, bool)
        for kid, j in kf_index.items():
            kkf = m.keyframes[kid]
            R[j] = kkf.R_cw
            t[j] = kkf.t_cw
            cam_free[j] = kid in local_set
        if n_fixed == 0 and len(all_kf_ids) > 1:
            oldest = min(all_kf_ids)
            cam_free[kf_index[oldest]] = False

        pts = np.zeros((L, 3), np.float32)
        pt_free = np.zeros(L, bool)
        obs_uv = np.zeros((L, K, 2), np.float32)
        obs_ur = np.full((L, K), -1.0, np.float32)
        inv_s2 = np.ones((L, K), np.float32)
        mask = np.zeros((L, K), bool)
        for li, mid in enumerate(mp_ids):
            mp = m.mappoints[mid]
            pts[li] = mp.position
            pt_free[li] = True
            for kid, fi in mp.observations.items():
                j = kf_index.get(kid)
                if j is None:
                    continue
                kkf = m.keyframes[kid]
                if fi >= len(kkf.kp_uv) or not kkf.valid[fi]:
                    continue
                obs_uv[li, j] = kkf.kp_uv[fi]
                obs_ur[li, j] = kkf.u_right[fi]
                inv_s2[li, j] = self.inv_sigma2[kkf.kp_level[fi]]
                mask[li, j] = True

        prob = BAProblem(
            poses=SE3(jnp.asarray(R), jnp.asarray(t)),
            points=jnp.asarray(pts),
            obs_uv=jnp.asarray(obs_uv),
            obs_ur=jnp.asarray(obs_ur),
            inv_sigma2=jnp.asarray(inv_s2),
            mask=jnp.asarray(mask),
            cam_free=jnp.asarray(cam_free),
            point_free=jnp.asarray(pt_free),
        )
        res = local_bundle_adjustment(prob, self.camera, jnp.float32(self.bf))

        # Write back poses/points; drop outlier observations.
        R_new = np.asarray(res.poses.R, np.float64)
        t_new = np.asarray(res.poses.t, np.float64)
        pts_new = np.asarray(res.points, np.float64)
        inl = np.asarray(res.inlier_mask)
        from fasttrack_tpu.nputils import orthonormalize

        # A diverged solve (all steps rejected, or float32 overflow in a
        # degenerate window) can leave non-finite entries; never write those
        # back into the map.
        for kid, j in kf_index.items():
            if cam_free[j] and np.isfinite(R_new[j]).all() and np.isfinite(t_new[j]).all():
                m.keyframes[kid].set_pose(orthonormalize(R_new[j]), t_new[j])
        for li, mid in enumerate(mp_ids):
            mp = m.mappoints.get(mid)
            if mp is None:
                continue
            if np.isfinite(pts_new[li]).all():
                mp.position = pts_new[li]
            for kid, fi in list(mp.observations.items()):
                j = kf_index.get(kid)
                if j is None or not mask[li, j]:
                    continue
                if not inl[li, j]:
                    kkf = m.keyframes.get(kid)
                    if kkf is not None and kkf.mp_ids[fi] == mid:
                        kkf.mp_ids[fi] = -1
                    if mp.erase_observation(kid):
                        m.erase_mappoint(mid)
                        break
        m.info_changed()

    def _cull_keyframes(self, kf: KeyFrame):
        """KeyFrameCulling (LocalMapping.cc:902): erase local KFs whose map
        points are >=90% observed by >=3 other KFs at same/finer scale."""
        m = self.atlas.current
        for kid in kf.best_covisible(10):
            other = m.keyframes.get(kid)
            if other is None or other.kid == m.init_kf_id:
                continue
            total = 0
            redundant = 0
            for fi, mid in enumerate(other.mp_ids):
                if mid < 0:
                    continue
                mp = m.mappoints.get(int(mid))
                if mp is None or mp.bad:
                    continue
                total += 1
                level = int(other.kp_level[fi])
                n_better = 0
                for okid, ofi in mp.observations.items():
                    if okid == other.kid:
                        continue
                    okf = m.keyframes.get(okid)
                    if okf is None:
                        continue
                    if int(okf.kp_level[ofi]) <= level + 1:
                        n_better += 1
                        if n_better >= 3:
                            break
                if n_better >= 3:
                    redundant += 1
            if total > 20 and redundant > 0.9 * total:
                m.erase_keyframe(other.kid)
