"""OptimizeSim3 parity (Optimizer.cc:2115): joint LM refinement of a loop
Sim3 with both-direction reprojection edges must beat the Horn/RANSAC
re-solve in the realistic regime (image observations trustworthy, paired 3D
points carrying map drift)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from fasttrack_tpu.optim.sim3_opt import optimize_sim3
from fasttrack_tpu.optim.sim3_solver import solve_sim3

K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
S_GT = 1.3
R_GT = Rotation.from_rotvec([0.05, -0.1, 0.2]).as_matrix()
T_GT = np.array([0.4, -0.2, 0.1])


def make_case(seed=7, n=120, px_noise=1.0, drift=0.02):
    rng = np.random.default_rng(seed)
    X2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(3, 8, n)], -1)
    X1 = S_GT * (X2 @ R_GT.T) + T_GT

    def proj(X):
        return np.stack([400 * X[:, 0] / X[:, 2] + 320,
                         400 * X[:, 1] / X[:, 2] + 240], -1)

    uv1 = proj(X1) + rng.normal(size=(n, 2)) * px_noise
    uv2 = proj(X2) + rng.normal(size=(n, 2)) * px_noise
    X1n = X1 + rng.normal(size=(n, 3)) * drift
    X2n = X2 + rng.normal(size=(n, 3)) * drift
    return X1n, X2n, uv1, uv2


def errors(s, R, t):
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R.T @ R_GT) - 1) / 2, -1, 1)))
    return abs(s - S_GT) / S_GT, ang, np.linalg.norm(t - T_GT)


class TestOptimizeSim3:
    def test_beats_horn_under_pixel_noise(self):
        X1, X2, uv1, uv2 = make_case()
        sig = np.ones(len(X1))
        horn = solve_sim3(X1, X2, uv1, uv2, K, K, sig, sig)
        assert horn.success
        opt = optimize_sim3(X1, X2, uv1, uv2, K, K, sig, sig,
                            horn.s, horn.R, horn.t)
        assert opt.success and opt.n_inliers >= 40
        eh = errors(horn.s, horn.R, horn.t)
        eo = errors(opt.s, opt.R, opt.t)
        # rotation and translation must improve; scale must not regress
        # beyond 2x (the LM anchors the Horn scale through the log prior)
        assert eo[1] < eh[1]
        assert eo[2] < eh[2]
        assert eo[0] < max(2.0 * eh[0], 0.005)

    def test_heavy_drift_regime(self):
        """Two independently-drifted maps: Horn is biased by the 3D noise,
        the reprojection LM recovers pose from the images."""
        X1, X2, uv1, uv2 = make_case(drift=0.05)
        sig = np.ones(len(X1))
        horn = solve_sim3(X1, X2, uv1, uv2, K, K, sig, sig)
        opt = optimize_sim3(X1, X2, uv1, uv2, K, K, sig, sig,
                            horn.s, horn.R, horn.t)
        assert opt.success
        eh = errors(horn.s, horn.R, horn.t)
        eo = errors(opt.s, opt.R, opt.t)
        assert eo[1] < 0.75 * eh[1]
        assert eo[2] < 0.5 * eh[2]

    def test_fix_scale(self):
        X1, X2, uv1, uv2 = make_case()
        sig = np.ones(len(X1))
        horn = solve_sim3(X1, X2, uv1, uv2, K, K, sig, sig, fix_scale=True)
        opt = optimize_sim3(X1, X2, uv1, uv2, K, K, sig, sig,
                            horn.s, horn.R, horn.t, fix_scale=True)
        assert opt.success
        assert opt.s == pytest.approx(horn.s, abs=1e-5)

    def test_outlier_retoggle(self):
        """Correspondences with gross outliers must be toggled out between
        LM rounds (Optimizer.cc:2264-2285) and reported in the mask."""
        X1, X2, uv1, uv2 = make_case(drift=0.0, px_noise=0.5)
        rng = np.random.default_rng(3)
        bad = rng.choice(len(X1), 25, replace=False)
        uv1 = uv1.copy()
        uv1[bad] += rng.uniform(30, 80, size=(25, 2))
        sig = np.ones(len(X1))
        opt = optimize_sim3(X1, X2, uv1, uv2, K, K, sig, sig,
                            S_GT * 1.02,
                            Rotation.from_rotvec([0.01, 0, 0]).as_matrix()
                            @ R_GT, T_GT + 0.05)
        assert opt.success
        assert not opt.inliers[bad].any()
        assert opt.inliers.sum() >= 80
        eo = errors(opt.s, opt.R, opt.t)
        assert eo[1] < 0.1 and eo[2] < 0.02

    def test_degenerate_too_few(self):
        opt = optimize_sim3(np.zeros((2, 3)), np.zeros((2, 3)),
                            np.zeros((2, 2)), np.zeros((2, 2)), K, K,
                            np.ones(2), np.ones(2), 1.0, np.eye(3),
                            np.zeros(3))
        assert not opt.success
