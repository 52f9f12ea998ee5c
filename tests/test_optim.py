"""Tests for pose optimization and local bundle adjustment."""

import numpy as np
import jax
import jax.numpy as jnp

from fasttrack_tpu.cameras import make_pinhole, project
from fasttrack_tpu.geometry import SE3, se3_apply, se3_compose, se3_exp, se3_inverse, se3_log
from fasttrack_tpu.optim import BAProblem, local_bundle_adjustment, pose_optimize

CAM = make_pinhole(458.0, 457.0, 376.0, 240.0, 752, 480)
BF = jnp.asarray(47.9)


def make_scene(rng, n=256, depth_range=(4.0, 12.0)):
    X = np.stack(
        [
            rng.uniform(-4, 4, size=n),
            rng.uniform(-3, 3, size=n),
            rng.uniform(*depth_range, size=n),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(X)


class TestPoseOptimize:
    def run_case(self, rng, noise=0.5, outlier_frac=0.2, stereo=True):
        Xw = make_scene(rng)
        n = Xw.shape[0]
        T_true = se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.01], jnp.float32))
        Xc = se3_apply(T_true, Xw)
        uv = project(CAM, Xc)
        ur = uv[:, 0] - BF / Xc[:, 2]
        uv = uv + jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32) * noise)
        n_out = int(n * outlier_frac)
        out_idx = rng.choice(n, n_out, replace=False)
        uv = uv.at[out_idx].add(
            jnp.asarray(rng.uniform(15, 40, size=(n_out, 2)).astype(np.float32))
        )
        if not stereo:
            ur = jnp.full(n, -1.0)
        T0 = se3_compose(
            se3_exp(jnp.asarray([0.05, 0.05, -0.05, 0.01, 0.02, -0.01], jnp.float32)),
            T_true,
        )
        res = pose_optimize(
            CAM, BF, T0, Xw, uv, ur, jnp.ones(n), jnp.ones(n, bool)
        )
        err = np.asarray(se3_log(se3_compose(res.pose, se3_inverse(T_true))))
        return res, err, out_idx

    def test_recovers_pose_stereo(self, rng):
        res, err, out_idx = self.run_case(rng)
        assert np.abs(err[:3]).max() < 0.01, err   # translation < 1 cm
        assert np.abs(err[3:]).max() < 0.002, err  # rotation < 0.1 deg

    def test_recovers_pose_mono(self, rng):
        res, err, _ = self.run_case(rng, stereo=False)
        assert np.abs(err[:3]).max() < 0.02, err
        assert np.abs(err[3:]).max() < 0.004, err

    def test_flags_outliers(self, rng):
        res, err, out_idx = self.run_case(rng)
        inl = np.asarray(res.inliers)
        assert not inl[out_idx].any()
        assert inl.mean() > 0.6
        assert int(res.n_inliers) == inl.sum()

    def test_noise_free_exact(self, rng):
        Xw = make_scene(rng, 64)
        T_true = se3_exp(jnp.asarray([0.2, 0.1, -0.1, 0.05, 0.0, 0.02], jnp.float32))
        Xc = se3_apply(T_true, Xw)
        uv = project(CAM, Xc)
        ur = uv[:, 0] - BF / Xc[:, 2]
        T0 = se3_compose(se3_exp(jnp.asarray([0.03] * 6, jnp.float32)), T_true)
        res = pose_optimize(CAM, BF, T0, Xw, uv, ur, jnp.ones(64), jnp.ones(64, bool))
        err = np.asarray(se3_log(se3_compose(res.pose, se3_inverse(T_true))))
        assert np.abs(err).max() < 1e-3
        assert int(res.n_inliers) == 64


class TestLocalBA:
    def make_problem(self, rng, K=6, L=128, noise=0.3, fix_first=2):
        Xw = np.asarray(make_scene(rng, L))
        # Cameras along a small trajectory looking at the scene.
        poses_true = []
        for k in range(K):
            xi = np.asarray(
                [0.15 * k, 0.01 * k, 0.0, 0.0, 0.02 * k, 0.0], np.float32
            )
            poses_true.append(se3_exp(jnp.asarray(xi)))
        P_true = SE3(
            jnp.stack([p.R for p in poses_true]), jnp.stack([p.t for p in poses_true])
        )
        Xc = se3_apply(SE3(P_true.R[None], P_true.t[None]), jnp.asarray(Xw)[:, None])
        uv = project(CAM, Xc)
        ur = uv[..., 0] - BF / Xc[..., 2]
        uv = uv + jnp.asarray(rng.normal(size=uv.shape).astype(np.float32) * noise)
        in_img = (
            (uv[..., 0] > 0) & (uv[..., 0] < 752) & (uv[..., 1] > 0) & (uv[..., 1] < 480)
            & (Xc[..., 2] > 0.5)
        )
        cam_free = jnp.asarray([k >= fix_first for k in range(K)])

        # Perturb free cameras and all points.
        def perturb(p, k):
            xi = jnp.asarray(rng.normal(size=6).astype(np.float32)) * jnp.where(
                cam_free[k], 0.02, 0.0
            )
            return se3_compose(se3_exp(xi), p)

        P0 = SE3(
            jnp.stack([perturb(SE3(P_true.R[k], P_true.t[k]), k).R for k in range(K)]),
            jnp.stack([perturb(SE3(P_true.R[k], P_true.t[k]), k).t for k in range(K)]),
        )
        X0 = jnp.asarray(Xw + rng.normal(size=Xw.shape).astype(np.float32) * 0.05)
        prob = BAProblem(
            poses=P0,
            points=X0,
            obs_uv=uv,
            obs_ur=ur,
            inv_sigma2=jnp.ones((L, K)),
            mask=in_img,
            cam_free=cam_free,
            point_free=jnp.ones(L, bool),
        )
        return prob, P_true, jnp.asarray(Xw)

    def test_converges(self, rng):
        prob, P_true, X_true = self.make_problem(rng)
        res = local_bundle_adjustment(prob, CAM, BF)
        # Gauge is pinned by the 2 fixed cameras -> compare directly.
        for k in range(2, 6):
            err = np.asarray(
                se3_log(
                    se3_compose(
                        SE3(res.poses.R[k], res.poses.t[k]),
                        se3_inverse(SE3(P_true.R[k], P_true.t[k])),
                    )
                )
            )
            assert np.abs(err).max() < 5e-3, (k, err)
        pt_err = np.linalg.norm(np.asarray(res.points - X_true), axis=-1)
        obs_count = np.asarray(prob.mask).sum(1)
        seen = obs_count >= 3
        assert np.median(pt_err[seen]) < 0.05

    def test_fixed_cameras_unchanged(self, rng):
        prob, P_true, _ = self.make_problem(rng)
        res = local_bundle_adjustment(prob, CAM, BF)
        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(res.poses.R[k]), np.asarray(prob.poses.R[k]), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(res.poses.t[k]), np.asarray(prob.poses.t[k]), atol=1e-6
            )

    def test_outlier_classification(self, rng):
        prob, P_true, X_true = self.make_problem(rng)
        # Corrupt some observations of camera 3.
        bad = np.zeros(prob.mask.shape, bool)
        bad[:20, 3] = True
        obs_uv = prob.obs_uv + jnp.asarray(bad[..., None] * 30.0)
        prob = prob._replace(obs_uv=obs_uv)
        res = local_bundle_adjustment(prob, CAM, BF)
        inl = np.asarray(res.inlier_mask)
        m = np.asarray(prob.mask)
        assert inl[bad & m].mean() < 0.1
        assert inl[~bad & m].mean() > 0.8
