"""System facade (src/System.cc): wires the whole pipeline and exposes the
public tracking API + trajectory/atlas persistence.

Mirrors the reference: ctor builds Atlas/Tracking/LocalMapping(/LoopClosing),
TrackStereo / TrackRGBD / TrackMonocular entry points, Shutdown, trajectory
savers in TUM / EuRoC / KITTI formats (System.cc:590-1285), Atlas save/load
(System.cc:1424-1560 — pickle instead of boost archives).
"""

from __future__ import annotations

import enum
import pickle
import time
from typing import Optional

import numpy as np

from fasttrack_tpu.geometry.so3 import matrix_to_quat
import jax.numpy as jnp

from fasttrack_tpu.kernels import KernelConfig, get_run_mode
from fasttrack_tpu.local_mapping import LocalMapper
from fasttrack_tpu.ops.extractor import OrbConfig
from fasttrack_tpu.settings import Settings
from fasttrack_tpu.slam_map import Atlas
from fasttrack_tpu.stats import Stats
from fasttrack_tpu.tracking import Tracker, TrackingState


def _pre_to_dict(p):
    """Host preintegration snapshot -> plain dict (pickle-stable)."""
    if p is None:
        return None
    return {
        "dT": p.dT, "dR": p.dR, "dV": p.dV, "dP": p.dP,
        "JRg": p.JRg, "JVg": p.JVg, "JVa": p.JVa, "JPg": p.JPg, "JPa": p.JPa,
        "C": p.C, "bg": p.b0.bg, "ba": p.b0.ba,
    }


def _pre_from_dict(d):
    if d is None:
        return None
    import types

    return types.SimpleNamespace(
        dT=d["dT"], dR=d["dR"], dV=d["dV"], dP=d["dP"],
        JRg=d["JRg"], JVg=d["JVg"], JVa=d["JVa"], JPg=d["JPg"], JPa=d["JPa"],
        C=d["C"],
        b0=types.SimpleNamespace(bg=d["bg"], ba=d["ba"]),
    )


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2
    IMU_MONOCULAR = 3
    IMU_STEREO = 4
    IMU_RGBD = 5


class System:
    def __init__(
        self,
        settings: Settings,
        sensor: Sensor = Sensor.STEREO,
        kernel_config: Optional[KernelConfig] = None,
        async_mapping: bool = False,
        vocabulary=None,
    ):
        self.settings = settings
        self.sensor = sensor
        self.kcfg = kernel_config or get_run_mode()
        self.stats = Stats()
        self.atlas = Atlas()

        # Input resize (System.cc:273-284 resize branch): when the settings
        # request a smaller working resolution, scale the intrinsics once and
        # bilinear-resize every incoming frame.
        self._resize_to = None
        if settings.new_width and settings.new_height and (
            settings.new_width != settings.width
            or settings.new_height != settings.height
        ):
            sx = settings.new_width / settings.width
            sy = settings.new_height / settings.height
            from fasttrack_tpu.cameras.models import Camera as _Cam

            def scale_cam(c):
                if c is None:
                    return None
                pp = np.asarray(c.params).copy()
                pp[0] *= sx
                pp[1] *= sy
                pp[2] *= sx
                pp[3] *= sy
                return _Cam(c.kind, jnp.asarray(pp),
                            settings.new_width, settings.new_height)

            settings.camera1 = scale_cam(settings.camera1)
            settings.camera2 = scale_cam(settings.camera2)
            settings.bf *= sx
            self._resize_to = (settings.new_height, settings.new_width)
            settings.width = settings.new_width
            settings.height = settings.new_height

        # Stereo rectification at startup (Settings::precomputeRectificationMaps,
        # src/Settings.cc; applied per frame like System.cc:273-284): when the
        # rig is distorted pinhole with a known extrinsic, precompute remap
        # tables and run the whole pipeline in the rectified frame.
        self._rect = None
        if (
            sensor in (Sensor.STEREO, Sensor.IMU_STEREO)
            and settings.camera_type == "PinHole"
            and settings.camera2 is not None
            and settings.T_c1_c2 is not None
            and settings.dist1 is not None
            and (np.any(settings.dist1)
                 or (settings.dist2 is not None and np.any(settings.dist2)))
        ):
            from fasttrack_tpu.cameras.rectify import compute_rectification

            self._rect = compute_rectification(
                settings.camera1, settings.dist1,
                settings.camera2,
                settings.dist2 if settings.dist2 is not None else np.zeros(4),
                settings.T_c1_c2, settings.width, settings.height,
            )
            settings.camera1 = self._rect.camera
            settings.bf = self._rect.bf
        self.atlas.add_camera(settings.camera1)

        orb = OrbConfig(
            height=settings.height,
            width=settings.width,
            n_features=settings.n_features,
            n_levels=settings.n_levels,
            scale_factor=settings.scale_factor,
            ini_threshold=settings.ini_th_fast,
            min_threshold=settings.min_th_fast,
        )
        # Place recognition is ON by default: the reference always loads
        # ORBvoc.txt (System.cc:130-146). vocabulary=None loads the shipped
        # artifact; vocabulary=False disables loop closing + relocalization.
        if vocabulary is None:
            from fasttrack_tpu.bow.vocabulary import load_default_vocabulary

            vocabulary = load_default_vocabulary()
        self.vocabulary = vocabulary if vocabulary is not False else None
        self.loop_closer = None
        if vocabulary is not None and vocabulary is not False:
            from fasttrack_tpu.loop_closing import LoopCloser

            K = np.asarray(settings.camera1.K())
            self.loop_closer = LoopCloser(
                self.atlas, vocabulary, K,
                scale_factor=settings.scale_factor,
                fix_scale=sensor in (Sensor.STEREO, Sensor.RGBD,
                                     Sensor.IMU_STEREO, Sensor.IMU_RGBD,
                                     Sensor.IMU_MONOCULAR),
                run_async=async_mapping,
                camera=settings.camera1,
                bf=settings.bf or 1.0,
                n_levels=settings.n_levels,
            )
        # Inertial calibration (IMU::Calib, ImuTypes.h:46-126) from settings.
        self.imu_calib = None
        if sensor in (Sensor.IMU_MONOCULAR, Sensor.IMU_STEREO, Sensor.IMU_RGBD):
            from fasttrack_tpu.imu.preintegration import ImuCalib

            T_bc = getattr(settings, "T_b_c1", None)
            if T_bc is None:
                T_bc = np.eye(4)
            T_bc = np.asarray(T_bc, np.float64)
            self.imu_calib = ImuCalib(
                R_bc=jnp.asarray(T_bc[:3, :3], jnp.float32),
                t_bc=jnp.asarray(T_bc[:3, 3], jnp.float32),
                noise_gyro=settings.imu_noise_gyro,
                noise_acc=settings.imu_noise_acc,
                walk_gyro=settings.imu_walk_gyro,
                walk_acc=settings.imu_walk_acc,
                freq=settings.imu_frequency,
            )
        monocular = sensor in (Sensor.MONOCULAR, Sensor.IMU_MONOCULAR)
        # KB8 fisheye stereo rig (Frame.cc fisheye route needs the extrinsic)
        stereo_rig = None
        if (
            settings.camera_type in ("KannalaBrandt8", "Fisheye")
            and settings.camera2 is not None
            and settings.T_c1_c2 is not None
            and sensor in (Sensor.STEREO, Sensor.IMU_STEREO)
        ):
            from fasttrack_tpu.cameras.stereo import StereoRig
            from fasttrack_tpu.geometry import SE3

            T_c2_c1 = np.linalg.inv(np.asarray(settings.T_c1_c2, np.float64))
            stereo_rig = StereoRig(
                settings.camera1, settings.camera2,
                SE3(jnp.asarray(T_c2_c1[:3, :3], jnp.float32),
                    jnp.asarray(T_c2_c1[:3, 3], jnp.float32)),
                jnp.asarray(settings.bf, jnp.float32),
            )
        self.local_mapper = LocalMapper(
            self.atlas, settings.camera1, settings.bf,
            settings.scale_factor, settings.n_levels,
            run_async=async_mapping,
            loop_closer=self.loop_closer,
            imu_calib=self.imu_calib,
            monocular=monocular,
        )
        self.tracker = Tracker(
            settings.camera1, orb, settings.bf or 1.0, self.atlas,
            kernel_config=self.kcfg, stats=self.stats,
            local_mapper=self.local_mapper,
            th_depth_factor=settings.th_depth,
            monocular=monocular,
            imu_calib=self.imu_calib,
            stereo_rig=stereo_rig,
        )
        self.local_mapper.tracker = self.tracker
        if self.loop_closer is not None:
            self.tracker.reloc_db = self.loop_closer.db
            self.atlas.set_kf_database(self.loop_closer.db)
            self.tracker.vocabulary = vocabulary
            self.loop_closer.tracker = self.tracker
            # inertial GBA after loop/merge reuses the mapper's window sweep
            self.loop_closer.local_mapper = self.local_mapper
        if settings.load_atlas:
            self.load_atlas(settings.load_atlas)

    # ------------------------------------------------------------- tracking
    def track_stereo(self, img_left, img_right, timestamp: float, imu=None):
        if self.sensor not in (Sensor.STEREO, Sensor.IMU_STEREO):
            raise RuntimeError("track_stereo called on non-stereo sensor config")
        if imu:
            self.tracker_grab_imu(imu)
        if self._resize_to is not None:
            img_left = self._resize_input(img_left)
            img_right = self._resize_input(img_right)
        if self._rect is not None:
            from fasttrack_tpu.cameras.rectify import remap_bilinear

            img_left = remap_bilinear(
                np.asarray(img_left), self._rect.map_lx, self._rect.map_ly
            )
            img_right = remap_bilinear(
                np.asarray(img_right), self._rect.map_rx, self._rect.map_ry
            )
        return self.tracker.track_stereo(img_left, img_right, timestamp)

    def _resize_input(self, img):
        """Bilinear resize to the configured working resolution."""
        h, w = self._resize_to
        img = np.asarray(img)
        ys = (np.arange(h) + 0.5) * img.shape[0] / h - 0.5
        xs = (np.arange(w) + 0.5) * img.shape[1] / w - 0.5
        from fasttrack_tpu.cameras.rectify import remap_bilinear

        mx, my = np.meshgrid(xs.astype(np.float32), ys.astype(np.float32))
        return remap_bilinear(img, mx, my)

    def track_rgbd(self, img, depth_map, timestamp: float, imu=None):
        if self.sensor not in (Sensor.RGBD, Sensor.IMU_RGBD):
            raise RuntimeError("track_rgbd called on non-RGBD sensor config")
        if imu:
            self.tracker_grab_imu(imu)
        if self._resize_to is not None:
            img = self._resize_input(img)
            depth_map = self._resize_input(depth_map)
        return self.tracker.track_rgbd(img, depth_map, timestamp)

    def track_monocular(self, img, timestamp: float, imu=None):
        if self.sensor not in (Sensor.MONOCULAR, Sensor.IMU_MONOCULAR):
            raise RuntimeError("track_monocular called on non-mono sensor config")
        if imu:
            self.tracker_grab_imu(imu)
        if self._resize_to is not None:
            img = self._resize_input(img)
        return self.tracker.track_monocular(img, timestamp)

    def tracker_grab_imu(self, imu_samples):
        """System::GrabImuData (System.cc:333): queue (t, acc, gyro) samples
        for per-frame preintegration in the tracker."""
        if self.imu_calib is None:
            raise RuntimeError("IMU samples passed to a non-inertial sensor config")
        self.tracker.grab_imu(imu_samples)

    @property
    def tracking_state(self) -> TrackingState:
        return self.tracker.state

    def activate_localization_mode(self):
        """System::ActivateLocalizationMode: freeze the map; the tracker
        localizes against it without inserting keyframes."""
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def shutdown(self):
        """System::Shutdown (System.cc:520-560): stop the worker threads,
        then persist the atlas if configured."""
        self.local_mapper.stop()
        if self.loop_closer is not None:
            self.loop_closer.stop()
        if self.settings.save_atlas:
            self.save_atlas(self.settings.save_atlas)

    # ------------------------------------------------------------ trajectory
    def _trajectory(self):
        return self.tracker.trajectory

    def save_trajectory_tum(self, path: str):
        """System::SaveTrajectoryTUM: 't tx ty tz qx qy qz qw' of Twc."""
        with open(path, "w") as f:
            for ts, R_cw, t_cw in self._trajectory():
                R_wc = R_cw.T
                t_wc = -R_wc @ t_cw
                q = np.asarray(matrix_to_quat(jnp.asarray(R_wc)))  # [w x y z]
                f.write(
                    f"{ts:.6f} {t_wc[0]:.7f} {t_wc[1]:.7f} {t_wc[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_trajectory_euroc(self, path: str):
        """System::SaveTrajectoryEuRoC: timestamps in ns, same quat order."""
        with open(path, "w") as f:
            for ts, R_cw, t_cw in self._trajectory():
                R_wc = R_cw.T
                t_wc = -R_wc @ t_cw
                q = np.asarray(matrix_to_quat(jnp.asarray(R_wc)))
                f.write(
                    f"{ts*1e9:.0f} {t_wc[0]:.9f} {t_wc[1]:.9f} {t_wc[2]:.9f} "
                    f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n"
                )

    def save_trajectory_kitti(self, path: str):
        """System::SaveTrajectoryKITTI: 3x4 Twc row-major per line."""
        with open(path, "w") as f:
            for _, R_cw, t_cw in self._trajectory():
                R_wc = R_cw.T
                t_wc = -R_wc @ t_cw
                M = np.hstack([R_wc, t_wc[:, None]])
                f.write(" ".join(f"{x:.9e}" for x in M.reshape(-1)) + "\n")

    def save_keyframe_trajectory_tum(self, path: str):
        kfs = sorted(self.atlas.current.keyframes.values(), key=lambda k: k.kid)
        with open(path, "w") as f:
            for kf in kfs:
                R_wc, t_wc = kf.pose_wc()
                q = np.asarray(matrix_to_quat(jnp.asarray(R_wc)))
                f.write(
                    f"{kf.timestamp:.6f} {t_wc[0]:.7f} {t_wc[1]:.7f} {t_wc[2]:.7f} "
                    f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
                )

    def save_stats(self, directory: str):
        self.stats.save(directory)

    # ----------------------------------------------------------- atlas io
    def save_atlas(self, path: str):
        """System::SaveAtlas — pickle of the PreSave'd id-graph."""
        from fasttrack_tpu.bow.vocabulary import vocabulary_checksum

        state = {
            "maps": [],
            "next_ids": (
                self.atlas._next_map_id,
                self.atlas._next_kf_id,
                self.atlas._next_mp_id,
            ),
            # MD5 vocabulary guard (System.cc:1424-1464): a map's BoW vectors
            # are meaningless under a different vocabulary, so refuse on load.
            "vocab_checksum": vocabulary_checksum(self.vocabulary),
        }
        for m in self.atlas.maps:
            state["maps"].append(
                {
                    "map_id": m.map_id,
                    "init_kf_id": m.init_kf_id,
                    "imu_initialized": m.imu_initialized,
                    "is_inertial": m.is_inertial,
                    "keyframes": {
                        k.kid: {
                            "frame_id": k.frame_id,
                            "timestamp": k.timestamp,
                            "R_cw": k.R_cw, "t_cw": k.t_cw,
                            "kp_uv": k.kp_uv, "kp_level": k.kp_level,
                            "kp_angle": k.kp_angle,
                            "desc_packed": k.desc_packed,
                            "desc_signed": k.desc_signed,
                            "u_right": k.u_right, "depth": k.depth,
                            "valid": k.valid, "mp_ids": k.mp_ids,
                            "covisible": k.covisible,
                            "parent_id": k.parent_id,
                            "children": k.children,
                            # inertial chain + place-recognition state
                            # (System.cc:1424-1560 serializes these too)
                            "velocity": k.velocity,
                            "imu_bias": k.imu_bias,
                            "prev_kf_id": k.prev_kf_id,
                            "next_kf_id": k.next_kf_id,
                            "preintegrated": _pre_to_dict(k.preintegrated),
                            "bow_vec": k.bow_vec,
                            "loop_edges": k.loop_edges,
                            "merge_edges": k.merge_edges,
                        }
                        for k in m.keyframes.values()
                    },
                    "mappoints": {
                        p.mid: {
                            "position": p.position,
                            "normal": p.normal,
                            "desc_packed": p.desc_packed,
                            "desc_signed": p.desc_signed,
                            "observations": p.observations,
                            "ref_kf_id": p.ref_kf_id,
                            "first_kf_id": p.first_kf_id,
                            "min_distance": p.min_distance,
                            "max_distance": p.max_distance,
                        }
                        for p in m.mappoints.values()
                    },
                }
            )
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_atlas(self, path: str):
        from fasttrack_tpu.slam_map import KeyFrame, Map, MapPoint

        from fasttrack_tpu.bow.vocabulary import vocabulary_checksum

        with open(path, "rb") as f:
            state = pickle.load(f)
        saved_ck = state.get("vocab_checksum")
        if saved_ck is not None:
            ck = vocabulary_checksum(self.vocabulary)
            if saved_ck and ck and saved_ck != ck:
                raise ValueError(
                    f"atlas at {path} was saved with a different vocabulary "
                    f"(checksum {saved_ck[:12]}… != {ck[:12]}…); refusing to "
                    "load (System.cc:1466-1479 vocabulary MD5 guard)"
                )
        self.atlas._maps.clear()
        (self.atlas._next_map_id, self.atlas._next_kf_id,
         self.atlas._next_mp_id) = state["next_ids"]
        for md in state["maps"]:
            m = Map(md["map_id"])
            m.kf_db = self.atlas.kf_db
            m.init_kf_id = md["init_kf_id"]
            m.imu_initialized = md.get("imu_initialized", False)
            m.is_inertial = md.get("is_inertial", False)
            for kid, kd in md["keyframes"].items():
                kf = KeyFrame(
                    kid, kd["frame_id"], kd["timestamp"], kd["R_cw"], kd["t_cw"],
                    kd["kp_uv"], kd["kp_level"], kd["kp_angle"],
                    kd["desc_packed"], kd["desc_signed"], kd["u_right"],
                    kd["depth"], kd["valid"],
                )
                kf.mp_ids = kd["mp_ids"]
                kf.covisible = kd["covisible"]
                kf.parent_id = kd["parent_id"]
                kf.children = kd["children"]
                kf.velocity = kd.get("velocity")
                kf.imu_bias = kd.get("imu_bias")
                kf.prev_kf_id = kd.get("prev_kf_id")
                kf.next_kf_id = kd.get("next_kf_id")
                kf.preintegrated = _pre_from_dict(kd.get("preintegrated"))
                kf.bow_vec = kd.get("bow_vec")
                kf.loop_edges = kd.get("loop_edges", set())
                kf.merge_edges = kd.get("merge_edges", set())
                m.add_keyframe(kf)
                if self.loop_closer is not None and kf.bow_vec is not None:
                    self.loop_closer.db.add(kf.kid, kf.bow_vec)
            for mid, pd in md["mappoints"].items():
                mp = MapPoint(mid, pd["position"], pd["ref_kf_id"], pd["first_kf_id"])
                mp.normal = pd["normal"]
                mp.desc_packed = pd["desc_packed"]
                mp.desc_signed = pd["desc_signed"]
                mp.observations = pd["observations"]
                mp.min_distance = pd["min_distance"]
                mp.max_distance = pd["max_distance"]
                m.add_mappoint(mp)
            self.atlas._maps.append(m)
        if self.atlas._maps:
            self.atlas.current = self.atlas._maps[-1]
            if self.atlas.current.keyframes:
                self.tracker.ref_kf_id = max(self.atlas.current.keyframes)
                self.tracker.state = TrackingState.RECENTLY_LOST
                # Inertial resume: restore the tracker's IMU anchor so a
                # loaded inertial map does not forget its initialization.
                last = self.atlas.current.keyframes[self.tracker.ref_kf_id]
                if (
                    self.imu_calib is not None
                    and self.atlas.current.imu_initialized
                    and last.velocity is not None
                ):
                    t = self.tracker
                    if last.imu_bias is not None:
                        t.bias = (np.asarray(last.imu_bias[0]),
                                  np.asarray(last.imu_bias[1]))
                    R_wb, p_w = t._body_from_cam(last.R_cw, last.t_cw)
                    t.last_kf_state = (R_wb, p_w, np.asarray(last.velocity))
                    t.v_w = np.asarray(last.velocity)
                    t.last_kf_id = last.kid
