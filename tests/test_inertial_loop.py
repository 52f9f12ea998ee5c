"""Inertial-aware loop closure: velocity transforms through Sim3 map
corrections, the gravity-preserving 4DoF essential graph, and the inertial
branch of the post-loop global BA (LoopClosing.cc:1053-1063 velocity
updates, Optimizer.cc:5292 OptimizeEssentialGraph4DoF,
LoopClosing.cc:2275-2280 FullInertialBA selection)."""

import numpy as np

from fasttrack_tpu.loop_closing import LoopCloser
from fasttrack_tpu.optim.pose_graph import (
    optimize_essential_graph_4dof,
    sim3_inv,
    sim3_mul,
)
from fasttrack_tpu.slam_map import Atlas

from tests.test_gba_merge import CAM, build_map


def _rotz(th):
    return np.array([[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])


class Test4DoFEssentialGraph:
    def _chain(self, n=8, drift_yaw=0.04, drift_t=0.05):
        """Straight-line KF chain with per-step yaw+translation drift and a
        loop edge back to the (drift-free) start."""
        rng = np.random.default_rng(1)
        true = {}
        poses = {}
        for k in range(n):
            R_true = np.eye(3)
            t_true = np.array([-0.5 * k, 0.0, 0.0])  # t_cw = -center
            true[k] = (1.0, R_true, t_true)
            yaw = drift_yaw * k
            Rd = _rotz(yaw)
            td = t_true + drift_t * k * rng.standard_normal(3) * 0.2
            poses[k] = (1.0, R_true @ Rd, td)
        edges = []
        for k in range(n - 1):
            Sji = sim3_mul(true[k + 1], sim3_inv(true[k]))
            edges.append((k, k + 1, Sji))
        # loop edge: last KF measured against the first with the TRUE
        # relative pose (what Sim3 verification provides)
        edges.append((0, n - 1, sim3_mul(true[n - 1], sim3_inv(true[0]))))
        poses[0] = true[0]
        poses[n - 1] = sim3_mul(true[n - 1], sim3_inv(true[0]))  # anchor-ish
        return true, poses, edges

    def test_reduces_drift(self):
        true, poses, edges = self._chain()
        out = optimize_essential_graph_4dof(poses, edges, {0}, iterations=15)
        err0 = max(
            np.linalg.norm(poses[k][2] - true[k][2]) for k in poses
        )
        err1 = max(
            np.linalg.norm(out[k][2] - true[k][2]) for k in out
        )
        assert err1 < 0.3 * err0, (err0, err1)

    def test_updates_preserve_gravity(self):
        """Every vertex's world-side update W_k = S_new^-1 o S_old must be a
        pure z-rotation + translation: W_k maps world z to world z exactly
        (the whole point of the 4DoF parameterization)."""
        _, poses, edges = self._chain()
        out = optimize_essential_graph_4dof(poses, edges, {0}, iterations=15)
        ez = np.array([0.0, 0.0, 1.0])
        for k in poses:
            _, Rw, _ = sim3_mul(sim3_inv(out[k]), poses[k])
            assert np.linalg.norm(Rw @ ez - ez) < 1e-6, k


class TestInertialLoopCorrection:
    def test_velocities_rotate_with_correction(self, rng):
        """Close a loop on an INERTIAL map whose return leg carries drifted
        poses AND velocities consistent with those drifted poses; after
        CorrectLoop the velocities must match the finite-difference motion of
        the CORRECTED trajectory (PredictStateIMU would otherwise integrate
        a stale world-frame velocity right after the weld)."""
        from fasttrack_tpu.bow.vocabulary import train_vocabulary

        atlas = Atlas()
        m = atlas.current
        kfs_a, pts_w, descs = build_map(atlas, rng, n_kf=6)
        th = 0.06
        Rd = _rotz(th)
        td = np.array([0.25, -0.15, 0.1])
        kfs_b, _, _ = build_map(
            atlas, rng, n_kf=3, world_T=(Rd, td),
            descs=descs, pts_w=pts_w, kf_x0=0.4,
        )
        # inertial map: KFs carry velocities consistent with their stored
        # (possibly drifted) frames; build_map KFs are 1 s apart moving
        # +0.4 x per step -> v = 0.4 x in the own frame.
        m.is_inertial = True
        m.imu_initialized = True
        v_true = np.array([0.4, 0.0, 0.0])
        for kf in kfs_a:
            kf.velocity = v_true.copy()
        for kf in kfs_b:
            kf.velocity = Rd @ v_true  # drifted-frame velocity
        voc = train_vocabulary(np.concatenate([descs, descs]), n_words=64, iters=2)
        lc = LoopCloser(
            atlas, voc, np.asarray(CAM.K()), camera=CAM, bf=1.0,
            run_gba=False, min_consistency=2,
        )
        for kf in kfs_a:
            lc.process_keyframe(kf.kid)
        closed = False
        for kf in kfs_b:
            closed |= lc.process_keyframe(kf.kid)
        assert closed
        # corrected velocities must agree with the corrected trajectory's
        # finite-difference motion (dt = 1 s between build_map KFs)
        for k in range(len(kfs_b) - 1):
            dc = kfs_b[k + 1].center - kfs_b[k].center
            v = np.asarray(kfs_b[k].velocity)
            assert np.linalg.norm(v - dc) < 0.25, (k, v, dc)
        # and the outbound leg's velocities are untouched by the correction
        # direction flip (they were already consistent)
        for kf in kfs_a[:3]:
            assert np.linalg.norm(np.asarray(kf.velocity) - v_true) < 0.2

    def test_converged_sweep_is_noop(self, rng):
        """full_inertial_ba_converged must stop early once the chain stops
        moving: after it reports convergence, another call runs exactly one
        round and moves nothing (the swept-window approximation of the joint
        FullInertialBA has a fixed point)."""
        from fasttrack_tpu.datasets.synthetic import generate_sequence
        from fasttrack_tpu.cameras import make_pinhole
        from fasttrack_tpu.settings import Settings
        from fasttrack_tpu.system import Sensor, System

        seq = generate_sequence(n_frames=60, h=240, w=320, seed=5)
        s = Settings()
        s.width = seq.frames[0].left.shape[1]
        s.height = seq.frames[0].left.shape[0]
        s.camera1 = make_pinhole(seq.fx, seq.fy, seq.cx, seq.cy, s.width, s.height)
        s.bf = seq.fx * seq.baseline
        s.baseline = seq.baseline
        s.th_depth = 60.0
        s.n_features = 512
        s.n_levels = 4
        s.T_b_c1 = np.eye(4)
        s.imu_frequency = 200.0
        sys = System(s, Sensor.IMU_STEREO, vocabulary=False)
        t_prev = -1.0
        for fr in seq.frames:
            sel = (seq.imu_t > t_prev) & (seq.imu_t <= fr.timestamp)
            imu = [
                (float(t), seq.imu_acc[i], seq.imu_gyro[i])
                for i, t in zip(np.where(sel)[0], seq.imu_t[sel])
            ]
            sys.track_stereo(fr.left, fr.right, fr.timestamp, imu=imu)
            t_prev = fr.timestamp
        m = sys.atlas.current
        assert m.imu_initialized
        latest = m.keyframes[max(m.keyframes)]
        sys.local_mapper.full_inertial_ba_converged(latest)
        before = {k.kid: k.t_cw.copy() for k in m.keyframes.values()}
        rounds = sys.local_mapper.full_inertial_ba_converged(latest)
        assert rounds == 1  # first re-round already under tolerance
        delta = max(
            np.abs(m.keyframes[kid].t_cw - t).max()
            for kid, t in before.items()
        )
        assert delta < 1e-3, delta

    def test_inertial_gba_branch_dispatch(self, rng):
        """_run_global_ba must route inertial maps to the mapper's convergent
        FullInertialBA sweep instead of visual-only GBA."""
        atlas = Atlas()
        build_map(atlas, rng, n_kf=4)
        m = atlas.current
        m.is_inertial = True
        m.imu_initialized = True

        class StubMapper:
            imu_calib = object()  # truthy

            def __init__(self):
                self.calls = 0

            def full_inertial_ba_converged(self, kf, should_abort=None,
                                           lock=None):
                self.calls += 1
                return 1

        lc = LoopCloser(atlas, None, np.asarray(CAM.K()), camera=CAM, bf=1.0)
        stub = StubMapper()
        lc.local_mapper = stub
        lc._run_global_ba()
        assert stub.calls == 1
        assert lc.n_gba_runs == 1
        # visual map falls back to the visual GBA (no stub call)
        m.is_inertial = False
        lc._run_global_ba()
        assert stub.calls == 1
        assert lc.n_gba_runs == 2
