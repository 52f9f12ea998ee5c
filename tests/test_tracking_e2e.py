"""End-to-end stereo tracking on a synthetic rendered sequence.

The SLAM equivalent of the reference's dataset evaluation (SURVEY.md 4):
render a stereo sequence with exact ground truth, run the full System
(extraction -> stereo -> motion-model tracking -> local map -> keyframes ->
local BA), and regression-check the absolute trajectory error.
"""

import numpy as np
import pytest

from fasttrack_tpu.cameras import make_pinhole
from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.evaluation import absolute_trajectory_error
from fasttrack_tpu.kernels import KernelConfig
from fasttrack_tpu.settings import Settings
from fasttrack_tpu.system import Sensor, System
from fasttrack_tpu.tracking import TrackingState


def make_system(seq, pose_optimization=True, async_mapping=False):
    s = Settings()
    s.width = seq.frames[0].left.shape[1]
    s.height = seq.frames[0].left.shape[0]
    s.camera1 = make_pinhole(seq.fx, seq.fy, seq.cx, seq.cy, s.width, s.height)
    s.bf = seq.fx * seq.baseline
    s.baseline = seq.baseline
    # ThDepth=60 (EuRoC configs use 35-60): the synthetic plane sits at ~6 m,
    # which must count as "close" for stereo keyframe insertion logic.
    s.th_depth = 60.0
    s.n_features = 512
    s.n_levels = 4
    return System(
        s,
        Sensor.STEREO,
        kernel_config=KernelConfig(pose_optimization=pose_optimization),
        async_mapping=async_mapping,
    )


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=30, h=240, w=320, seed=3)


class TestStereoTrackingE2E:
    def test_tracks_sequence_with_low_ate(self, seq):
        sys = make_system(seq)
        for fr in seq.frames:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK
        traj = sys.tracker.trajectory
        assert len(traj) >= len(seq.frames) - 2  # first frame initializes

        t_est = np.asarray([t for t, _, _ in traj])
        p_est = np.asarray([-R.T @ t_ for _, R, t_ in traj])
        ate = absolute_trajectory_error(t_est, p_est, seq.gt_t, seq.gt_pos)
        # Stereo gives metric scale; demand centimetre-level ATE on this
        # easy textured-plane scene.
        assert ate["rmse"] < 0.05, ate
        # scale should be close to metric even when not optimized for
        assert sys.atlas.current.n_keyframes() >= 2

    def test_bypass_pose_optimization_mode(self, seq):
        """The FastTrack ablation: pose optimization off in TrackLocalMap
        (Tracking.cc:3080-3106). Tracking should survive, with worse ATE."""
        sys = make_system(seq, pose_optimization=False)
        for fr in seq.frames:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK

    def test_stats_recorded(self, seq, tmp_path):
        sys = make_system(seq)
        for fr in seq.frames[:6]:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        summ = sys.stats.summary()
        assert "tracking_total" in summ and summ["tracking_total"]["n"] >= 5
        assert "orb_extraction" in summ
        sys.save_stats(str(tmp_path))
        assert (tmp_path / "data" / "tracking_total.txt").exists()
        assert (tmp_path / "summary.json").exists()

    def test_trajectory_savers(self, seq, tmp_path):
        sys = make_system(seq)
        for fr in seq.frames[:8]:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        for name, fn in [
            ("tum.txt", sys.save_trajectory_tum),
            ("euroc.txt", sys.save_trajectory_euroc),
            ("kitti.txt", sys.save_trajectory_kitti),
            ("kf.txt", sys.save_keyframe_trajectory_tum),
        ]:
            path = tmp_path / name
            fn(str(path))
            lines = path.read_text().strip().splitlines()
            assert len(lines) >= 1
        tum = (tmp_path / "tum.txt").read_text().splitlines()[0].split()
        assert len(tum) == 8
        kitti = (tmp_path / "kitti.txt").read_text().splitlines()[0].split()
        assert len(kitti) == 12

    def test_atlas_roundtrip(self, seq, tmp_path):
        sys = make_system(seq)
        for fr in seq.frames[:10]:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        n_kf = sys.atlas.current.n_keyframes()
        n_mp = sys.atlas.current.n_mappoints()
        path = str(tmp_path / "atlas.pkl")
        sys.save_atlas(path)
        sys2 = make_system(seq)
        sys2.load_atlas(path)
        assert sys2.atlas.current.n_keyframes() == n_kf
        assert sys2.atlas.current.n_mappoints() == n_mp
        kf0 = min(sys.atlas.current.keyframes)
        np.testing.assert_allclose(
            sys2.atlas.current.keyframes[kf0].t_cw,
            sys.atlas.current.keyframes[kf0].t_cw,
        )


class TestRelocalization:
    def test_lost_then_relocalizes_with_default_vocab(self, seq):
        """Visual-only lost -> relocalize (Tracking::Relocalization,
        Tracking.cc:3798) with the SHIPPED default vocabulary: blank frames
        drop tracking to RECENTLY_LOST; when the camera revisits a mapped
        view, BoW candidates + PnP re-acquire the ORIGINAL map (no new map
        in the Atlas)."""
        sys = make_system(seq)  # vocabulary defaults to the shipped artifact
        assert sys.loop_closer is not None  # place recognition is ON
        for fr in seq.frames[:20]:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK
        n_maps_before = sys.atlas.n_maps()
        assert sys.atlas.current.n_keyframes() >= 1

        blank = np.full_like(seq.frames[0].left, 127)
        t = seq.frames[19].timestamp
        for k in range(3):  # < time_recently_lost: stays RECENTLY_LOST
            t += 0.05
            sys.track_stereo(blank, blank, t)
        assert sys.tracking_state == TrackingState.RECENTLY_LOST

        # revisit an already-mapped view
        for fr in seq.frames[12:18]:
            t += 0.05
            sys.track_stereo(fr.left, fr.right, t)
        assert sys.tracking_state == TrackingState.OK
        assert sys.atlas.n_maps() == n_maps_before  # relocalized, not reset
        # pose must be consistent with the revisited ground truth (~frame 13)
        _, R_cw, t_cw = sys.tracker.trajectory[-1]
        c_est = -R_cw.T @ t_cw
        gt = seq.gt_pos[17]
        assert np.linalg.norm(c_est - gt) < 0.25, (c_est, gt)

    def test_relocalizes_from_offset_view(self, seq):
        """Harder re-acquisition: after going lost near the END of the
        sweep, the camera reappears at the START — a larger pose offset
        from the last tracked view. The widening-window refinement
        (Tracking.cc:3889-3975) must still reach >=50 inliers."""
        sys = make_system(seq)
        for fr in seq.frames[:20]:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        assert sys.tracking_state == TrackingState.OK
        n_maps_before = sys.atlas.n_maps()

        blank = np.full_like(seq.frames[0].left, 127)
        t = seq.frames[19].timestamp
        for _ in range(3):
            t += 0.05
            sys.track_stereo(blank, blank, t)
        assert sys.tracking_state == TrackingState.RECENTLY_LOST

        # reappear at the very start of the trajectory (largest offset)
        for fr in seq.frames[0:6]:
            t += 0.05
            sys.track_stereo(fr.left, fr.right, t)
        assert sys.tracking_state == TrackingState.OK
        assert sys.atlas.n_maps() == n_maps_before
        _, R_cw, t_cw = sys.tracker.trajectory[-1]
        c_est = -R_cw.T @ t_cw
        gt = seq.gt_pos[5]
        assert np.linalg.norm(c_est - gt) < 0.25, (c_est, gt)
