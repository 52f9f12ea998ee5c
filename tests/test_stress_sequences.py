"""Stress sequences toward real-data failure modes (Tracking.cc:2038-2089
recovery matrix): low-texture dropout with reacquisition, photometric
(exposure) shifts, and rotation-only motion where monocular initialization
must refuse to build a degenerate map."""

import numpy as np
import pytest

from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.evaluation import absolute_trajectory_error
from fasttrack_tpu.tracking import TrackingState

from tests.test_mono_e2e import make_mono_system
from tests.test_tracking_e2e import make_system


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=36, h=240, w=320, seed=3)


def _ate(sys_, seq):
    traj = sys_.tracker.trajectory
    t_est = np.asarray([t for t, _, _ in traj])
    p_est = np.asarray([-R.T @ tc for _, R, tc in traj])
    return absolute_trajectory_error(t_est, p_est, seq.gt_t, seq.gt_pos,
                                     max_dt=0.05)


class TestExposureShift:
    def test_tracks_through_gain_swing(self, seq):
        """Auto-exposure style gain/bias swings (x0.6 .. x1.4 plus bias):
        FAST thresholds and descriptor comparisons must ride through;
        tracking stays OK and ATE stays centimetric."""
        sys_ = make_system(seq)
        states = []
        for i, fr in enumerate(seq.frames):
            gain = 1.0 + 0.4 * np.sin(2 * np.pi * i / 12.0)
            bias = 12.0 * np.sin(2 * np.pi * i / 7.0)
            l = np.clip(fr.left * gain + bias, 0, 255)
            r = np.clip(fr.right * gain + bias, 0, 255)
            sys_.track_stereo(l, r, fr.timestamp)
            states.append(sys_.tracking_state)
        assert states[-1] == TrackingState.OK
        # never fully LOST mid-sequence
        assert TrackingState.LOST not in states, states
        ate = _ate(sys_, seq)
        assert ate["rmse"] < 0.08, ate


class TestLowTextureDropout:
    def test_recently_lost_then_reacquires(self, seq):
        """A low-texture stretch (contrast crushed to 5%: featureless wall)
        drops tracking to RECENTLY_LOST; when texture returns on the SAME
        view, the tracker must reacquire without abandoning the session
        (OK at the end; relocalization or motion-model reacquisition,
        Tracking.cc:2038-2069)."""
        sys_ = make_system(seq)
        states = []
        for i, fr in enumerate(seq.frames):
            if 18 <= i < 24:   # featureless-wall stretch
                l = 127.0 + 0.05 * (fr.left - 127.0)
                r = 127.0 + 0.05 * (fr.right - 127.0)
            else:
                l, r = fr.left, fr.right
            sys_.track_stereo(l, r, fr.timestamp)
            states.append(sys_.tracking_state)
        assert TrackingState.OK in states[:18]
        # the dropout must be DETECTED (not silently "tracked")
        assert any(
            st in (TrackingState.RECENTLY_LOST, TrackingState.LOST)
            for st in states[18:24]
        ), states[18:24]
        # and recovered from
        assert states[-1] == TrackingState.OK, states[24:]


class TestRotationOnlyMono:
    def test_mono_refuses_degenerate_init(self):
        """Pure rotation = zero parallax: monocular two-view initialization
        must NOT produce a map (TwoViewReconstruction model select +
        CheckRT parallax/triangulation gates); a wrong init here poisons
        the whole session in the reference too."""
        seq = generate_sequence(n_frames=20, h=240, w=320, seed=3,
                                trajectory="rotation_only")
        sys_ = make_mono_system(seq)
        for fr in seq.frames:
            sys_.track_monocular(fr.left, fr.timestamp)
        assert sys_.tracking_state != TrackingState.OK
        assert sys_.atlas.current.n_keyframes() <= 1
        assert sys_.atlas.current.n_mappoints() < 50

    def test_init_succeeds_once_translation_begins(self):
        """After the rotation-only prefix, translation restores parallax and
        initialization must succeed (same System instance)."""
        rot = generate_sequence(n_frames=10, h=240, w=320, seed=3,
                                trajectory="rotation_only")
        trans = generate_sequence(n_frames=20, h=240, w=320, seed=3)
        sys_ = make_mono_system(trans)
        for fr in rot.frames:
            sys_.track_monocular(fr.left, fr.timestamp)
        assert sys_.tracking_state != TrackingState.OK
        t0 = rot.frames[-1].timestamp
        states = []
        for fr in trans.frames:
            sys_.track_monocular(fr.left, t0 + 0.05 + fr.timestamp)
            states.append(sys_.tracking_state)
        assert TrackingState.OK in states, states


class TestTlmCapOrdering:
    def test_candidates_ordered_by_covisibility_not_id(self):
        """Local-map candidates must come seeds-first so the fixed TLM cap
        (4096) truncates distant history, not the live view. A plain
        np.unique sorted by id would keep the OLDEST points (regression:
        long-session frame-900 degradation on the 1000-frame gate)."""
        from fasttrack_tpu.cameras import make_pinhole
        from fasttrack_tpu.ops import OrbConfig
        from fasttrack_tpu.slam_map import Atlas, MapPoint
        from fasttrack_tpu.tracking import TrackedFrame, Tracker
        from tests.test_robustness import make_kf

        atlas = Atlas()
        m = atlas.current
        rng = np.random.default_rng(0)

        def add_points(kf, ids_start, n):
            mids = []
            for i in range(n):
                mp = MapPoint(ids_start + i,
                              rng.uniform(-1, 1, 3) + [0, 0, 5], kf.kid,
                              kf.kid)
                m.add_mappoint(mp)
                mp.add_observation(kf.kid, i)
                kf.mp_ids[i] = mp.mid
                mids.append(mp.mid)
            return mids

        # old KF with LOW ids, far away; seed KF with HIGH ids
        kf_old = make_kf(atlas, [50, 0, 0], np.zeros((56, 2)),
                         np.ones((56, 256), np.int8))
        old_ids = add_points(kf_old, 0, 40)
        kf_seed = make_kf(atlas, [0, 0, 0], np.zeros((40, 2)),
                          np.ones((40, 256), np.int8))
        seed_ids = add_points(kf_seed, 10_000, 40)
        # covisibility link: kf_old also observes 16 of the seed's points
        for i in range(16):
            mp = m.mappoints[seed_ids[i]]
            mp.add_observation(kf_old.kid, 40 + i)
            kf_old.mp_ids[40 + i] = mp.mid
        m.update_connections(kf_seed)

        cam = make_pinhole(160.0, 160.0, 160.0, 120.0, 320, 240)
        tr = Tracker(cam, OrbConfig(height=240, width=320, n_features=64,
                                    n_levels=2), bf=32.0, atlas=atlas)
        frame = TrackedFrame(
            frame_id=0, timestamp=0.0,
            kp_uv=np.zeros((40, 2), np.float32),
            kp_level=np.zeros(40, np.int32),
            kp_angle=np.zeros(40, np.float32),
            desc_packed=np.zeros((40, 32), np.uint8),
            desc_signed=np.zeros((40, 256), np.int8),
            u_right=np.full(40, -1.0, np.float32),
            depth=np.full(40, -1.0, np.float32),
            valid=np.ones(40, bool),
            mp_ids=np.asarray(seed_ids[:20] + [-1] * 20),
        )
        _, mp_ids = tr._local_map_ids(frame)
        # the seed KF's (high-id) points must come FIRST
        n_seed = len(seed_ids)
        assert set(mp_ids[:n_seed]) == set(seed_ids), mp_ids[:10]
        assert set(old_ids) <= set(mp_ids[n_seed:])
