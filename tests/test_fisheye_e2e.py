"""End-to-end KB8 fisheye stereo tracking on a synthetic scene
(the reference's TUM-VI route: Frame.cc fisheye ctor :1115,
ComputeStereoFishEyeMatches + KannalaBrandt8::TriangulateMatches)."""

import numpy as np
import pytest

from fasttrack_tpu.cameras.models import make_kannala_brandt8
from fasttrack_tpu.datasets.synthetic import _render, make_texture
from fasttrack_tpu.settings import Settings
from fasttrack_tpu.system import Sensor, System
from fasttrack_tpu.tracking import TrackingState

W, H = 384, 288
FX = 160.0


def kb8_cam():
    return make_kannala_brandt8(
        FX, FX, W / 2, H / 2, 0.02, -0.01, 0.003, -0.001, W, H
    )


@pytest.fixture(scope="module")
def seq():
    rng = np.random.default_rng(3)
    tex = make_texture(rng, size=1024)
    cam = kb8_cam()
    baseline = 0.22
    frames = []
    n = 18
    for i in range(n):
        t = i / 10.0
        # gentle translate + yaw
        ang = 0.02 * np.sin(0.5 * i)
        ca, sa = np.cos(ang), np.sin(ang)
        R_wc = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
        t_wc = np.array([0.045 * i, 0.01 * np.sin(i), 0.0])
        left = _render(tex, 160.0, None, R_wc, t_wc, H, W, plane_z=3.5,
                       camera=cam).astype(np.uint8)
        t_wc_r = t_wc + R_wc @ np.array([baseline, 0, 0])
        right = _render(tex, 160.0, None, R_wc, t_wc_r, H, W, plane_z=3.5,
                        camera=cam).astype(np.uint8)
        frames.append((t, left, right, R_wc, t_wc))
    return frames, baseline


def make_system(baseline):
    s = Settings()
    s.camera_type = "KannalaBrandt8"
    s.width, s.height = W, H
    s.camera1 = kb8_cam()
    s.camera2 = kb8_cam()
    T = np.eye(4)
    T[:3, 3] = [baseline, 0, 0]
    s.T_c1_c2 = T
    s.bf = baseline * FX
    s.baseline = baseline
    s.n_features = 1024
    s.n_levels = 4
    s.th_depth = 40.0
    return System(s, Sensor.STEREO, vocabulary=False)


class TestFisheyeStereoE2E:
    def test_tracks_and_recovers_trajectory(self, seq):
        frames, baseline = seq
        sys_ = make_system(baseline)
        assert sys_.tracker.stereo_rig is not None
        for t, left, right, _, _ in frames:
            sys_.track_stereo(left, right, t)
        assert sys_.tracker.state == TrackingState.OK
        traj = sys_.tracker.trajectory
        assert len(traj) >= len(frames) - 2
        # estimated camera centers vs ground truth (no global alignment
        # needed: the first frame anchors the world at identity)
        errs = []
        for (t, _, _, R_wc, t_wc), (ts, R_cw, t_cw) in zip(frames[1:], traj[1:]):
            c_est = -R_cw.T @ t_cw
            errs.append(np.linalg.norm(c_est - t_wc))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        assert rmse < 0.08, (rmse, errs[-3:])

    def test_fisheye_depth_sane(self, seq):
        frames, baseline = seq
        sys_ = make_system(baseline)
        t, left, right, _, _ = frames[0]
        sys_.track_stereo(left, right, t)
        lf = sys_.tracker.last_frame
        d = lf.depth[lf.depth > 0]
        assert len(d) > 80
        # scene depth: background plane at 3.5 m, foreground at 2 m
        assert 1.5 < np.median(d) < 4.5
