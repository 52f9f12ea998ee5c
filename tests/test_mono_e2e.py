"""Monocular end-to-end tracking on the synthetic sequence: two-view
initialization + epipolar new-point triangulation + scale-aligned ATE."""

import numpy as np
import pytest

from fasttrack_tpu.cameras import make_pinhole
from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.evaluation import absolute_trajectory_error
from fasttrack_tpu.settings import Settings
from fasttrack_tpu.system import Sensor, System
from fasttrack_tpu.tracking import TrackingState


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=30, h=240, w=320, seed=3)


def make_mono_system(seq):
    s = Settings()
    s.width = 320
    s.height = 240
    s.camera1 = make_pinhole(seq.fx, seq.fy, seq.cx, seq.cy, 320, 240)
    s.bf = 0.0
    s.n_features = 512
    s.n_levels = 4
    return System(s, Sensor.MONOCULAR)


class TestMonocularE2E:
    def test_initializes_and_tracks(self, seq):
        sys_ = make_mono_system(seq)
        states = []
        for fr in seq.frames:
            sys_.track_monocular(fr.left, fr.timestamp)
            states.append(sys_.tracking_state)
        assert TrackingState.OK in states, "never initialized"
        # must stay OK for the latter half of the sequence
        ok_tail = [st == TrackingState.OK for st in states[-10:]]
        assert sum(ok_tail) >= 8, states[-10:]

    def test_scale_aligned_ate(self, seq):
        sys_ = make_mono_system(seq)
        for fr in seq.frames:
            sys_.track_monocular(fr.left, fr.timestamp)
        traj = sys_.tracker.trajectory
        assert len(traj) >= 15
        t_est = np.asarray([t for t, _, _ in traj])
        p_est = np.asarray([-R.T @ t_ for _, R, t_ in traj])
        ate = absolute_trajectory_error(
            t_est, p_est, seq.gt_t, seq.gt_pos, with_scale=True
        )
        # monocular scale is arbitrary; Sim3-aligned error should be small
        assert ate["rmse"] < 0.08, ate
        # map keeps growing via triangulation
        assert sys_.atlas.current.n_mappoints() > 200
