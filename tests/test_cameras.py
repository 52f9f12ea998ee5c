"""Camera model tests: project/unproject roundtrips, Jacobians, stereo
triangulation — golden-checked against NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from fasttrack_tpu.cameras import (
    make_kannala_brandt8,
    make_pinhole,
    make_rectified_rig,
    project,
    project_jacobian,
    triangulate_matches,
    unproject,
)
from fasttrack_tpu.cameras.stereo import StereoRig, triangulate_two_view
from fasttrack_tpu.geometry import SE3, se3_apply, se3_exp, se3_inverse

# EuRoC-like pinhole and TUM-VI-like fisheye intrinsics.
PINHOLE = make_pinhole(458.654, 457.296, 367.215, 248.375, 752, 480)
KB8 = make_kannala_brandt8(
    190.97847, 190.9733, 254.93170, 256.89741,
    0.0034823894, 0.0007150348, -0.0020532361, 0.00020293673,
    512, 512,
)


def random_points(rng, n=256, fov_limit=0.9):
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    depth = rng.uniform(0.5, 20.0, size=(n, 1))
    return (d * depth).astype(np.float32)


class TestPinhole:
    def test_project_oracle(self, rng):
        X = random_points(rng)
        uv = np.asarray(project(PINHOLE, jnp.asarray(X)))
        u_ref = 458.654 * X[:, 0] / X[:, 2] + 367.215
        v_ref = 457.296 * X[:, 1] / X[:, 2] + 248.375
        np.testing.assert_allclose(uv[:, 0], u_ref, rtol=1e-5)
        np.testing.assert_allclose(uv[:, 1], v_ref, rtol=1e-5)

    def test_unproject_roundtrip(self, rng):
        X = random_points(rng)
        uv = project(PINHOLE, jnp.asarray(X))
        ray = unproject(PINHOLE, uv)
        X_dir = X / X[:, 2:3]
        np.testing.assert_allclose(np.asarray(ray), X_dir, atol=1e-4)

    def test_jacobian_numeric(self, rng):
        X = random_points(rng, 16)
        J = np.asarray(project_jacobian(PINHOLE, jnp.asarray(X)))
        eps = 1e-3
        for k in range(3):
            d = np.zeros(3, np.float32)
            d[k] = eps
            num = (
                np.asarray(project(PINHOLE, jnp.asarray(X + d)))
                - np.asarray(project(PINHOLE, jnp.asarray(X - d)))
            ) / (2 * eps)
            np.testing.assert_allclose(J[:, :, k], num, rtol=2e-2, atol=1e-2)


class TestKB8:
    def test_center_projects_to_principal_point(self):
        X = jnp.asarray([[0.0, 0.0, 5.0]])
        uv = np.asarray(project(KB8, X))
        np.testing.assert_allclose(uv[0], [254.93170, 256.89741], atol=1e-3)

    def test_unproject_roundtrip(self, rng):
        # fisheye: generous field of view, up to ~80 deg off-axis
        n = 256
        theta = rng.uniform(0, 1.4, size=n)
        psi = rng.uniform(0, 2 * np.pi, size=n)
        d = np.stack(
            [np.sin(theta) * np.cos(psi), np.sin(theta) * np.sin(psi), np.cos(theta)],
            axis=-1,
        ).astype(np.float32)
        uv = project(KB8, jnp.asarray(d))
        ray = np.asarray(unproject(KB8, uv))
        ray = ray / np.linalg.norm(ray, axis=-1, keepdims=True)
        np.testing.assert_allclose(ray, d, atol=1e-4)

    def test_wide_angle_distortion_nonlinear(self):
        # Equidistant model: pixel radius ~ f * theta(1 + ...), strongly
        # sub-linear in tan(theta) => a 60deg ray lands well inside where a
        # pinhole would put it.
        theta = np.deg2rad(60.0)
        X = jnp.asarray([[np.sin(theta), 0.0, np.cos(theta)]], dtype=jnp.float32)
        uv = np.asarray(project(KB8, X))
        r_fisheye = abs(uv[0, 0] - 254.93170)
        r_pinhole = 190.97847 * np.tan(theta)
        assert r_fisheye < 0.75 * r_pinhole


class TestStereo:
    def test_triangulate_two_view_exact(self, rng):
        X = random_points(rng, 64)
        T_21 = se3_exp(jnp.asarray([0.11, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32))
        r1 = X / X[:, 2:3]
        X2 = np.asarray(se3_apply(T_21, jnp.asarray(X)))
        r2 = X2 / X2[:, 2:3]
        Xt = np.asarray(triangulate_two_view(jnp.asarray(r1), jnp.asarray(r2), T_21))
        np.testing.assert_allclose(Xt, X, rtol=1e-2, atol=1e-2)

    def test_rectified_rig_depth(self):
        rig = make_rectified_rig(PINHOLE, bf=47.9)
        b = float(np.asarray(rig.baseline))
        np.testing.assert_allclose(b, 47.9 / 458.654, rtol=1e-5)

    def test_triangulate_matches_validates(self, rng):
        # KB8 stereo rig with a 10cm baseline.
        T_rl = se3_exp(jnp.asarray([-0.101, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32))
        rig = StereoRig(KB8, KB8, T_rl, jnp.asarray(190.97847 * 0.101))
        # Depths 1-4 m: within the parallax gate (cos > 0.9998 is rejected,
        # i.e. depth <~ 5 m at a 10 cm baseline — same gate as the reference).
        X = random_points(rng, 128)
        X = X / np.linalg.norm(X, axis=-1, keepdims=True)
        X = X * rng.uniform(1.0, 4.0, size=(128, 1)).astype(np.float32)
        X[:, 2] = np.abs(X[:, 2]) + 1.0
        uv1 = project(rig.left, jnp.asarray(X))
        X_r = se3_apply(T_rl, jnp.asarray(X))
        uv2 = project(rig.right, X_r)
        ones = jnp.ones(128)
        depth, Xt, valid = triangulate_matches(rig, uv1, uv2, ones, ones)
        valid = np.asarray(valid)
        inside = (
            (np.asarray(uv1) > 10).all(-1)
            & (np.asarray(uv1) < 500).all(-1)
            & (np.asarray(uv2) > 10).all(-1)
            & (np.asarray(uv2) < 500).all(-1)
        )
        assert valid[inside].mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(depth)[valid], X[valid, 2], rtol=0.05
        )

    def test_triangulate_matches_rejects_mismatches(self, rng):
        T_rl = se3_exp(jnp.asarray([-0.101, 0.0, 0.0, 0.0, 0.0, 0.0], jnp.float32))
        rig = StereoRig(KB8, KB8, T_rl, jnp.asarray(190.97847 * 0.101))
        X = random_points(rng, 64)
        X[:, 2] = np.abs(X[:, 2]) + 1.0
        uv1 = project(rig.left, jnp.asarray(X))
        uv2_wrong = uv1 + jnp.asarray(rng.uniform(30, 60, size=(64, 2)).astype(np.float32))
        ones = jnp.ones(64)
        _, _, valid = triangulate_matches(rig, uv1, uv2_wrong, ones, ones)
        assert np.asarray(valid).mean() < 0.2
