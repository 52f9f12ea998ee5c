"""Tracking robustness: duplicate-point fusion, timestamp jumps, bad-IMU
reset, localization-only mode (Tracking.cc:1885-1912, :1862-1867,
System::ActivateLocalizationMode; LocalMapping::SearchInNeighbors)."""

import numpy as np
import pytest

from fasttrack_tpu.cameras import make_pinhole
from fasttrack_tpu.local_mapping import LocalMapper
from fasttrack_tpu.slam_map import Atlas, KeyFrame, MapPoint
from fasttrack_tpu.tracking import TrackingState

W, H = 640, 480
FX = 400.0
CAM = make_pinhole(FX, FX, W / 2, H / 2, W, H)


def make_kf(atlas, t_wc, kp_uv, descs_signed, timestamp=0.0):
    packed = np.packbits((descs_signed > 0).astype(np.uint8), axis=1)
    n = len(kp_uv)
    kf = KeyFrame(
        atlas.next_kf_id(), 0, timestamp, np.eye(3), -np.asarray(t_wc, float),
        kp_uv.astype(np.float32), np.zeros(n, np.int32), np.zeros(n, np.float32),
        packed, descs_signed.astype(np.int8),
        np.full(n, -1.0, np.float32), np.full(n, -1.0, np.float32),
        np.ones(n, bool),
    )
    atlas.current.add_keyframe(kf)
    return kf


class TestFuse:
    def test_duplicate_points_fuse_to_one(self, rng):
        """Two keyframes each created their own map point for the same 3D
        landmark; SearchInNeighbors must merge them (ORBmatcher::Fuse)."""
        atlas = Atlas()
        m = atlas.current
        n_pts = 60
        pts = np.stack(
            [rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
             rng.uniform(4, 7, n_pts)], -1,
        )
        descs = (2 * rng.integers(0, 2, (n_pts, 256)).astype(np.int8) - 1)

        def proj(X):
            return np.stack(
                [FX * X[:, 0] / X[:, 2] + W / 2, FX * X[:, 1] / X[:, 2] + H / 2], -1
            )

        kf1 = make_kf(atlas, [0, 0, 0], proj(pts), descs)
        kf2 = make_kf(atlas, [0.3, 0, 0], proj(pts - [0.3, 0, 0]), descs)
        sf, nl = 1.2, 8
        n_shared = 16  # covisibility needs some genuinely shared points
        shared = {}
        for kf, center in ((kf1, np.zeros(3)), (kf2, np.array([0.3, 0, 0]))):
            for i in range(n_pts):
                if i < n_shared and i in shared:
                    mp = shared[i]
                else:
                    mp = MapPoint(atlas.next_mp_id(), pts[i], kf.kid, kf.kid)
                    mp.desc_signed = descs[i]
                    mp.desc_packed = np.packbits((descs[i] > 0).astype(np.uint8))
                    m.add_mappoint(mp)
                    if i < n_shared:
                        shared[i] = mp
                mp.add_observation(kf.kid, i)
                kf.mp_ids[i] = mp.mid
                mp.update_normal_and_depth({kf.kid: center}, center, 0, sf, nl)
        m.update_connections(kf1)
        m.update_connections(kf2)
        n_dup = n_pts - n_shared
        assert m.n_mappoints() == n_pts + n_dup

        lm = LocalMapper(atlas, CAM, bf=1.0, scale_factor=sf, n_levels=nl)
        n_fused = lm._search_in_neighbors(kf2)
        assert n_fused > 0.8 * n_dup
        # duplicates merged: map shrank and survivors have both observations
        assert m.n_mappoints() <= n_pts + 0.2 * n_dup
        both = sum(
            1 for mp in m.mappoints.values()
            if kf1.kid in mp.observations and kf2.kid in mp.observations
        )
        assert both > 0.8 * n_pts


def _stereo_system():
    from fasttrack_tpu.settings import Settings
    from fasttrack_tpu.system import Sensor, System

    s = Settings()
    s.camera1 = make_pinhole(160.0, 160.0, 160.0, 120.0, 320, 240)
    s.width, s.height = 320, 240
    s.bf = 160.0 * 0.2
    s.baseline = 0.2
    s.n_features = 512
    s.n_levels = 4
    return System(s, Sensor.STEREO, vocabulary=False)


@pytest.fixture(scope="module")
def small_seq():
    from fasttrack_tpu.datasets.synthetic import _render, make_texture

    rng = np.random.default_rng(7)
    tex = make_texture(rng, 1024)
    K = np.array([[160.0, 0, 160], [0, 160.0, 120], [0, 0, 1.0]])
    frames = []
    for i in range(10):
        t_wc = np.array([0.05 * i, 0, 0])
        left = _render(tex, 160.0, K, np.eye(3), t_wc, 240, 320, 3.5).astype(np.uint8)
        right = _render(tex, 160.0, K, np.eye(3), t_wc + [0.2, 0, 0], 240, 320,
                        3.5).astype(np.uint8)
        frames.append((0.1 * i, left, right))
    return frames


class TestTimestampJump:
    def test_backwards_jump_resets_map(self, small_seq):
        sys_ = _stereo_system()
        for t, l, r in small_seq[:5]:
            sys_.track_stereo(l, r, t)
        assert sys_.tracker.state == TrackingState.OK
        n_before = sys_.atlas.current.n_keyframes()
        assert n_before >= 1
        # feed a frame far in the PAST
        t, l, r = small_seq[5]
        sys_.track_stereo(l, r, -10.0)
        assert len(sys_.tracker.stats.series.get("timestamp_jump_backwards", [])) == 1
        # the map was reset and re-initialized from the offending frame
        assert sys_.atlas.current.n_keyframes() <= 1


class TestLocalizationOnly:
    def test_no_new_keyframes_while_active(self, small_seq):
        sys_ = _stereo_system()
        for t, l, r in small_seq[:4]:
            sys_.track_stereo(l, r, t)
        sys_.activate_localization_mode()
        n_kf = sys_.atlas.current.n_keyframes()
        n_mp = sys_.atlas.current.n_mappoints()
        for t, l, r in small_seq[4:]:
            out = sys_.track_stereo(l, r, t)
        assert sys_.tracker.state == TrackingState.OK
        assert out is not None  # still localizes
        assert sys_.atlas.current.n_keyframes() == n_kf
        assert sys_.atlas.current.n_mappoints() == n_mp
        sys_.deactivate_localization_mode()
        for t, l, r in small_seq[4:]:
            sys_.track_stereo(l, r, t + 1.0)
        assert sys_.atlas.current.n_keyframes() >= n_kf  # may grow again


class TestBadImuReset:
    def test_lost_before_imu_init_resets_map(self):
        """Losing track before IMU initialization wipes the active map
        (Tracking.cc:1862-1867) instead of keeping a broken VI state."""
        from fasttrack_tpu.imu.preintegration import ImuCalib
        import jax.numpy as jnp
        from fasttrack_tpu.tracking import Tracker
        from fasttrack_tpu.ops import OrbConfig

        atlas = Atlas()
        calib = ImuCalib(
            R_bc=jnp.eye(3), t_bc=jnp.zeros(3),
            noise_gyro=1e-4, noise_acc=1e-3,
            walk_gyro=1e-5, walk_acc=1e-4, freq=100.0,
        )
        tr = Tracker(
            CAM, OrbConfig(height=H, width=W, n_features=256, n_levels=4),
            bf=80.0, atlas=atlas, imu_calib=calib,
        )
        m = atlas.current
        # fake a small map that never initialized its IMU
        kf = make_kf(atlas, [0, 0, 0], np.zeros((4, 2)), np.ones((4, 256), np.int8))
        assert m.n_keyframes() == 1 and not m.imu_initialized
        tr.state = TrackingState.LOST
        tr._handle_lost()
        assert m.n_keyframes() == 0
        assert tr.state == TrackingState.NOT_INITIALIZED
        assert len(tr.stats.series.get("bad_imu_reset", [])) == 1


class TestViewer:
    def test_frame_and_map_render(self, tmp_path, small_seq):
        """Viewer renders frame overlays + a 3D map view headlessly
        (Viewer.cc / FrameDrawer.cc / MapDrawer.cc equivalents)."""
        sys_ = _stereo_system()
        for t, l, r in small_seq[:4]:
            sys_.track_stereo(l, r, t)
        from fasttrack_tpu.viewer import Viewer

        v = Viewer(sys_, str(tmp_path), fps=1.0)
        v.push_image(small_seq[3][1])
        frame_png, map_png = v.render_once()
        import os
        from PIL import Image

        assert os.path.exists(frame_png) and os.path.exists(map_png)
        fr = np.asarray(Image.open(frame_png))
        assert fr.shape[2] == 3 and fr.shape[0] == 240
        mp = np.asarray(Image.open(map_png))
        assert mp.ndim == 3 and mp.shape[2] == 3


class TestInputResize:
    def test_settings_resize_scales_intrinsics_and_frames(self, small_seq):
        """System.cc:273-284 resize branch: Camera.newWidth/newHeight scale
        the intrinsics once and every frame on entry; tracking still works."""
        from fasttrack_tpu.settings import Settings
        from fasttrack_tpu.system import Sensor, System

        s = Settings()
        s.camera1 = make_pinhole(160.0, 160.0, 160.0, 120.0, 320, 240)
        s.width, s.height = 320, 240
        s.new_width, s.new_height = 160, 120
        s.bf = 160.0 * 0.2
        s.baseline = 0.2
        s.n_features = 256
        s.n_levels = 3
        sys_ = System(s, Sensor.STEREO, vocabulary=False)
        p = np.asarray(sys_.tracker.camera.params)
        assert abs(p[0] - 80.0) < 1e-6 and abs(p[2] - 80.0) < 1e-6
        assert sys_.tracker.cfg.width == 160 and sys_.tracker.cfg.height == 120
        for t, l, r in small_seq[:6]:
            sys_.track_stereo(l, r, t)
        assert sys_.tracker.state == TrackingState.OK
