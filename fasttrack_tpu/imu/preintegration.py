"""IMU preintegration on manifold, as a lax.scan over fixed-size batches.

Parity target: IMU::Preintegrated (include/ImuTypes.h:143-221,
src/ImuTypes.cc IntegrateNewMeasurement): delta R/V/P on SO(3)xR^6, the five
bias Jacobians JRg, JVg, JVa, JPg, JPa, and the 15x15 covariance propagated
with the standard (Forster et al.) discrete model, plus bias-corrected
delta getters used by the inertial optimization edges (G2oTypes EdgeInertial).

TPU-first design: measurements arrive as padded fixed-shape arrays
(acc (N,3), gyro (N,3), dt (N,)) with dt==0 rows acting as no-ops, so one
jitted scan covers every frame regardless of sample count; batches of
preintegrations vmap cleanly (used by the inertial BA over keyframe windows).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fasttrack_tpu.geometry.so3 import hat, so3_exp, so3_log, so3_right_jacobian

GRAVITY_VALUE = 9.81  # ImuTypes.h:43
# tuple, not a module-level jnp array (a captured device-buffer constant
# degrades the runtime's dispatch path); jnp.asarray'd at trace time
GRAVITY = (0.0, 0.0, -GRAVITY_VALUE)


def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _mv(A, x):
    return jnp.einsum("...ij,...j->...i", A, x, precision=jax.lax.Precision.HIGHEST)


class ImuBias(NamedTuple):
    """Gyro + accelerometer bias (IMU::Bias, ImuTypes.h:46-126)."""

    bg: jnp.ndarray  # (..., 3)
    ba: jnp.ndarray  # (..., 3)

    @staticmethod
    def zero(dtype=jnp.float32) -> "ImuBias":
        return ImuBias(jnp.zeros(3, dtype), jnp.zeros(3, dtype))


class ImuCalib(NamedTuple):
    """IMU-camera calibration (IMU::Calib): T_bc and noise densities."""

    R_bc: jnp.ndarray  # (3, 3) body <- camera rotation
    t_bc: jnp.ndarray  # (3,)
    noise_gyro: float
    noise_acc: float
    walk_gyro: float
    walk_acc: float
    freq: float

    @staticmethod
    def default(freq: float = 200.0) -> "ImuCalib":
        return ImuCalib(
            jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, dtype=jnp.float32),
            1.7e-4, 2.0e-3, 1.9e-5, 3.0e-3, freq,
        )

    def noise_cov(self) -> jnp.ndarray:
        """6x6 discrete noise covariance Nga (ImuTypes Calib ctor: sigma^2 * freq)."""
        sg2 = self.noise_gyro**2 * self.freq
        sa2 = self.noise_acc**2 * self.freq
        return jnp.diag(jnp.asarray([sg2] * 3 + [sa2] * 3, dtype=jnp.float32))

    def walk_cov(self) -> jnp.ndarray:
        """6x6 random-walk covariance NgaWalk (sigma^2 / freq)."""
        wg2 = self.walk_gyro**2 / self.freq
        wa2 = self.walk_acc**2 / self.freq
        return jnp.diag(jnp.asarray([wg2] * 3 + [wa2] * 3, dtype=jnp.float32))


class Preintegrated(NamedTuple):
    """Preintegrated deltas between two frames/keyframes.

    Fields mirror IMU::Preintegrated (ImuTypes.h:179-197): dT, dR, dV, dP,
    the bias Jacobians, the 15x15 covariance C (order: [phi, v, p, bg, ba]),
    the linearization bias b0, and average acc/gyro (used by IMU init).
    """

    dT: jnp.ndarray
    dR: jnp.ndarray  # (3, 3)
    dV: jnp.ndarray  # (3,)
    dP: jnp.ndarray  # (3,)
    JRg: jnp.ndarray  # (3, 3)
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    C: jnp.ndarray  # (15, 15)
    b0: ImuBias
    avgA: jnp.ndarray
    avgW: jnp.ndarray

    @staticmethod
    def identity(b0: ImuBias | None = None) -> "Preintegrated":
        eye = jnp.eye(3, dtype=jnp.float32)
        zero3 = jnp.zeros(3, dtype=jnp.float32)
        zero33 = jnp.zeros((3, 3), dtype=jnp.float32)
        return Preintegrated(
            jnp.asarray(0.0, jnp.float32), eye, zero3, zero3,
            zero33, zero33, zero33, zero33, zero33,
            jnp.zeros((15, 15), dtype=jnp.float32),
            b0 if b0 is not None else ImuBias.zero(),
            zero3, zero3,
        )


def integrate_measurements(
    pre: Preintegrated,
    acc: jnp.ndarray,   # (N, 3) raw accelerometer samples
    gyro: jnp.ndarray,  # (N, 3) raw gyro samples
    dt: jnp.ndarray,    # (N,)   per-sample integration times; 0 = padding
    calib: ImuCalib,
) -> Preintegrated:
    """Integrate a padded block of measurements (IntegrateNewMeasurement,
    src/ImuTypes.cc), one lax.scan step per sample; dt==0 rows are no-ops."""
    Nga = calib.noise_cov()
    NgaWalk = calib.walk_cov()

    def step(p: Preintegrated, x):
        a_raw, w_raw, h = x
        valid = h > 0
        hs = jnp.where(valid, h, 1.0)  # avoid 0*inf paths; masked out below
        a = a_raw - p.b0.ba
        w = w_raw - p.b0.bg

        # Position/velocity updates with the *old* dR (ImuTypes.cc order).
        dRa = _mv(p.dR, a)
        dP_new = p.dP + p.dV * hs + 0.5 * dRa * hs * hs
        dV_new = p.dV + dRa * hs

        # Covariance propagation (A, B of the 9x9 [phi, v, p] block).
        Wa = hat(a)
        dRWa = _mm(p.dR, Wa)
        dRi = so3_exp(w * hs)
        Jr = so3_right_jacobian(w * hs)

        A = jnp.eye(9, dtype=jnp.float32)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dRWa * hs)
        A = A.at[6:9, 0:3].set(-0.5 * dRWa * hs * hs)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * hs)

        B = jnp.zeros((9, 6), dtype=jnp.float32)
        B = B.at[0:3, 0:3].set(Jr * hs)
        B = B.at[3:6, 3:6].set(p.dR * hs)
        B = B.at[6:9, 3:6].set(0.5 * p.dR * hs * hs)

        C9 = p.C[:9, :9]
        C9_new = _mm(_mm(A, C9), A.T) + _mm(_mm(B, Nga), B.T)
        C_new = p.C.at[:9, :9].set(C9_new)
        C_new = C_new.at[9:, 9:].add(NgaWalk)

        # Jacobian updates (position/velocity first with old values).
        JPa_new = p.JPa + p.JVa * hs - 0.5 * p.dR * hs * hs
        JPg_new = p.JPg + p.JVg * hs - 0.5 * _mm(dRWa, p.JRg) * hs * hs
        JVa_new = p.JVa - p.dR * hs
        JVg_new = p.JVg - _mm(dRWa, p.JRg) * hs

        dR_new = _mm(p.dR, dRi)
        JRg_new = _mm(dRi.T, p.JRg) - Jr * hs

        n_old = jnp.maximum(p.dT * calib.freq, 0.0)  # approx sample count
        avgA_new = (p.avgA * n_old + a_raw) / (n_old + 1.0)
        avgW_new = (p.avgW * n_old + w_raw) / (n_old + 1.0)

        def sel(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(valid, n, o), new, old
            )

        p_new = Preintegrated(
            p.dT + jnp.where(valid, hs, 0.0),
            dR_new, dV_new, dP_new,
            JRg_new, JVg_new, JVa_new, JPg_new, JPa_new,
            C_new, p.b0, avgA_new, avgW_new,
        )
        return sel(p_new, p), None

    out, _ = jax.lax.scan(step, pre, (acc, gyro, dt))
    return out


def preintegrate(
    acc: jnp.ndarray, gyro: jnp.ndarray, dt: jnp.ndarray,
    calib: ImuCalib, b0: ImuBias | None = None,
) -> Preintegrated:
    return integrate_measurements(Preintegrated.identity(b0), acc, gyro, dt, calib)


# --- bias-corrected getters (ImuTypes.h GetDeltaRotation/Velocity/Position) --


def delta_rotation(pre: Preintegrated, b: ImuBias) -> jnp.ndarray:
    dbg = b.bg - pre.b0.bg
    return _mm(pre.dR, so3_exp(_mv(pre.JRg, dbg)))


def delta_velocity(pre: Preintegrated, b: ImuBias) -> jnp.ndarray:
    dbg = b.bg - pre.b0.bg
    dba = b.ba - pre.b0.ba
    return pre.dV + _mv(pre.JVg, dbg) + _mv(pre.JVa, dba)


def delta_position(pre: Preintegrated, b: ImuBias) -> jnp.ndarray:
    dbg = b.bg - pre.b0.bg
    dba = b.ba - pre.b0.ba
    return pre.dP + _mv(pre.JPg, dbg) + _mv(pre.JPa, dba)


def predict_state(
    R_wb: jnp.ndarray, v_w: jnp.ndarray, p_w: jnp.ndarray,
    pre: Preintegrated, b: ImuBias,
):
    """Dead-reckon the next body state (Tracking::PredictStateIMU,
    Tracking.cc:1795): R2 = R1 dR(b), v2 = v1 + g t + R1 dV(b),
    p2 = p1 + v1 t + 0.5 g t^2 + R1 dP(b)."""
    t = pre.dT
    R2 = _mm(R_wb, delta_rotation(pre, b))
    g = jnp.asarray(GRAVITY, dtype=v_w.dtype)
    v2 = v_w + g * t + _mv(R_wb, delta_velocity(pre, b))
    p2 = p_w + v_w * t + 0.5 * g * t * t + _mv(R_wb, delta_position(pre, b))
    return R2, v2, p2
