"""MLPnP relocalization solver (MLPnPsolver.cpp parity): RANSAC + the
maximum-likelihood bearing-nullspace Gauss-Newton refinement, which must
beat the plain DLT refit under anisotropic (pyramid-level-dependent)
noise."""

import numpy as np
from scipy.spatial.transform import Rotation

from fasttrack_tpu.optim.pnp import _dlt_pnp, ml_refine, ransac_pnp

FOCAL = 400.0
R_GT = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_matrix()
T_GT = np.array([0.3, -0.1, 0.2])


def make_case(seed=0, n=150, aniso=True, outlier_frac=0.15):
    rng = np.random.default_rng(seed)
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                  rng.uniform(4, 12, n)], -1)
    Xc = X @ R_GT.T + T_GT
    rays = Xc / Xc[:, 2:]
    # pyramid-level-dependent pixel noise: sigma 0.5 .. 4 px
    levels = rng.integers(0, 4, n)
    sigma = 0.5 * 1.7 ** levels if aniso else np.full(n, 1.0)
    rays = rays.copy()
    rays[:, :2] += rng.normal(size=(n, 2)) * (sigma / FOCAL)[:, None]
    n_out = int(outlier_frac * n)
    bad = rng.choice(n, n_out, replace=False)
    rays[bad, :2] += rng.uniform(0.05, 0.3, size=(n_out, 2))
    return X, rays, sigma**2, bad


def pose_err(R, t):
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R.T @ R_GT) - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(t - T_GT)


class TestRansacPnP:
    def test_recovers_pose_and_rejects_outliers(self):
        X, rays, sigma2, bad = make_case()
        res = ransac_pnp(X, rays, sigma2, FOCAL)
        assert res.success
        ang, dt = pose_err(res.R_cw, res.t_cw)
        assert ang < 0.5 and dt < 0.05, (ang, dt)
        assert not res.inliers[bad].any() or res.inliers[bad].mean() < 0.2

    def test_ml_refine_beats_dlt_under_anisotropic_noise(self):
        """The point of the ML formulation (MLPnPsolver.cpp vs plain DLT):
        covariance weighting downweights coarse-pyramid observations."""
        gains = 0
        for seed in range(6):
            X, rays, sigma2, _ = make_case(seed=seed, outlier_frac=0.0)
            inl = np.ones(len(X), bool)
            R0, t0 = _dlt_pnp(X, rays)
            Rm, tm = ml_refine(X, rays, sigma2, FOCAL, R0, t0, inl)
            e_dlt = sum(pose_err(R0, t0))
            e_ml = sum(pose_err(Rm, tm))
            gains += e_ml < e_dlt
        assert gains >= 5, gains  # ML wins (nearly) always

    def test_degenerate_too_few(self):
        res = ransac_pnp(np.zeros((4, 3)), np.ones((4, 3)), np.ones(4), FOCAL)
        assert not res.success

    def test_collinear_points_do_not_crash(self):
        rng = np.random.default_rng(0)
        X = np.stack([np.linspace(-2, 2, 30), np.zeros(30),
                      np.full(30, 6.0)], -1)
        Xc = X @ R_GT.T + T_GT
        rays = Xc / Xc[:, 2:]
        rays[:, :2] += rng.normal(size=(30, 2)) * 0.002
        res = ransac_pnp(X, rays, np.ones(30), FOCAL)
        # collinear geometry is ambiguous: either refuse or stay finite
        assert np.isfinite(res.R_cw).all() and np.isfinite(res.t_cw).all()
