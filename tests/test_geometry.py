"""Golden tests for the Lie-group core vs scipy/NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from fasttrack_tpu.geometry import (
    SE3,
    Sim3,
    hat,
    matrix_to_quat,
    quat_to_matrix,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_log,
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
    so3_exp,
    so3_log,
    so3_right_jacobian,
)
from fasttrack_tpu.geometry.so3 import (
    normalize_rotation,
    so3_left_jacobian,
    so3_left_jacobian_inv,
)


def random_rotvecs(rng, n=64):
    v = rng.normal(size=(n, 3))
    scales = rng.uniform(0.0, np.pi - 0.05, size=(n, 1))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * scales
    v[0] = 0.0  # identity
    v[1] = [1e-9, 0, 0]  # tiny angle
    return v.astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        phi = random_rotvecs(rng)
        R = np.asarray(so3_exp(jnp.asarray(phi)))
        R_ref = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_log_roundtrip(self, rng):
        phi = random_rotvecs(rng)
        phi_rt = np.asarray(so3_log(so3_exp(jnp.asarray(phi))))
        np.testing.assert_allclose(phi_rt, phi, atol=1e-4)

    def test_log_near_pi(self, rng):
        v = rng.normal(size=(16, 3))
        v = v / np.linalg.norm(v, axis=-1, keepdims=True) * (np.pi - 1e-4)
        R = Rotation.from_rotvec(v).as_matrix().astype(np.float32)
        phi = np.asarray(so3_log(jnp.asarray(R)))
        R_rt = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(R_rt, R, atol=1e-3)

    def test_left_jacobian_numeric(self, rng):
        phi = random_rotvecs(rng, 8)[3:]
        J = np.asarray(so3_left_jacobian(jnp.asarray(phi)))
        eps = 1e-4
        for k in range(phi.shape[0]):
            num = np.zeros((3, 3))
            R0 = Rotation.from_rotvec(phi[k]).as_matrix()
            for i in range(3):
                d = np.zeros(3)
                d[i] = eps
                R1 = Rotation.from_rotvec(phi[k] + d).as_matrix()
                num[:, i] = Rotation.from_matrix(R1 @ R0.T).as_rotvec() / eps
            np.testing.assert_allclose(J[k], num, atol=1e-2)

    def test_jacobian_inverse(self, rng):
        phi = jnp.asarray(random_rotvecs(rng, 16))
        J = so3_left_jacobian(phi)
        Jinv = so3_left_jacobian_inv(phi)
        prod = np.asarray(J @ Jinv)
        np.testing.assert_allclose(
            prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4
        )

    def test_right_jacobian_is_left_of_neg(self, rng):
        phi = jnp.asarray(random_rotvecs(rng, 16))
        np.testing.assert_allclose(
            np.asarray(so3_right_jacobian(phi)),
            np.asarray(so3_left_jacobian(-phi)),
            atol=1e-6,
        )

    def test_quat_roundtrip(self, rng):
        phi = random_rotvecs(rng)
        R = so3_exp(jnp.asarray(phi))
        q = matrix_to_quat(R)
        R2 = quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        # scipy cross-check (scipy uses xyzw order)
        q_ref = Rotation.from_matrix(np.asarray(R)).as_quat()
        q_ref = np.concatenate([q_ref[:, 3:4], q_ref[:, :3]], axis=-1)
        q_ref *= np.where(q_ref[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-5)

    def test_normalize_rotation(self, rng):
        phi = random_rotvecs(rng, 8)
        R = Rotation.from_rotvec(phi).as_matrix() + rng.normal(size=(8, 3, 3)) * 1e-3
        Rn = np.asarray(normalize_rotation(jnp.asarray(R.astype(np.float32))))
        np.testing.assert_allclose(
            Rn @ np.swapaxes(Rn, -1, -2), np.broadcast_to(np.eye(3), Rn.shape), atol=1e-5
        )
        assert np.all(np.linalg.det(Rn) > 0.9)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
        T = se3_exp(xi)
        xi_rt = se3_log(T)
        np.testing.assert_allclose(np.asarray(xi_rt), np.asarray(xi), atol=1e-4)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
        T = se3_exp(xi)
        I = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(
            np.asarray(I.R), np.broadcast_to(np.eye(3), I.R.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
        T = se3_exp(xi)
        x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        y = se3_apply(T, x)
        y_ref = np.einsum("nij,nj->ni", np.asarray(T.R), np.asarray(x)) + np.asarray(T.t)
        np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)

    def test_jit_and_vmap(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
        f = jax.jit(lambda v: se3_log(se3_exp(v)))
        np.testing.assert_allclose(np.asarray(f(xi)), np.asarray(xi), atol=1e-4)
        g = jax.vmap(lambda v: se3_exp(v).t)
        assert g(xi).shape == (8, 3)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.5
        S = sim3_exp(jnp.asarray(xi))
        xi_rt = np.asarray(sim3_log(S))
        np.testing.assert_allclose(xi_rt, xi, atol=1e-3)

    def test_zero_is_identity(self):
        S = sim3_exp(jnp.zeros((7,)))
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.t), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 7)).astype(np.float32) * 0.5)
        S = sim3_exp(xi)
        I = sim3_compose(S, sim3_inverse(S))
        np.testing.assert_allclose(
            np.asarray(I.R), np.broadcast_to(np.eye(3), I.R.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.s), 1.0, atol=1e-5)

    def test_scale_action(self, rng):
        S = Sim3(jnp.eye(3), jnp.zeros(3), jnp.asarray(2.0))
        x = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(sim3_apply(S, x)), [2.0, 4.0, 6.0])
