"""IMU preintegration tests vs analytic / NumPy-Euler oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from fasttrack_tpu.imu import (
    GRAVITY_VALUE,
    ImuBias,
    ImuCalib,
    Preintegrated,
    delta_position,
    delta_rotation,
    delta_velocity,
    integrate_measurements,
    predict_state,
    preintegrate,
)

CALIB = ImuCalib.default(freq=200.0)
DT = 1.0 / 200.0


def const_inputs(n, acc, gyro):
    a = np.tile(np.asarray(acc, np.float32), (n, 1))
    w = np.tile(np.asarray(gyro, np.float32), (n, 1))
    h = np.full(n, DT, np.float32)
    return jnp.asarray(a), jnp.asarray(w), jnp.asarray(h)


class TestPreintegration:
    def test_constant_gyro_rotation(self):
        w = [0.1, -0.2, 0.3]
        a, g, h = const_inputs(200, [0, 0, 0], w)
        pre = preintegrate(a, g, h, CALIB)
        R_ref = Rotation.from_rotvec(np.asarray(w)).as_matrix()  # 1 second
        np.testing.assert_allclose(np.asarray(pre.dR), R_ref, atol=1e-4)
        np.testing.assert_allclose(float(pre.dT), 1.0, rtol=1e-5)

    def test_constant_accel_no_rotation(self):
        acc = [1.0, -2.0, 0.5]
        a, g, h = const_inputs(200, acc, [0, 0, 0])
        pre = preintegrate(a, g, h, CALIB)
        np.testing.assert_allclose(np.asarray(pre.dV), np.asarray(acc), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(pre.dP), 0.5 * np.asarray(acc), rtol=2e-3
        )

    def test_padding_is_noop(self):
        a, g, h = const_inputs(100, [1.0, 0, 0], [0, 0, 0.5])
        pre1 = preintegrate(a, g, h, CALIB)
        a2 = jnp.concatenate([a, jnp.ones((50, 3))], axis=0)
        g2 = jnp.concatenate([g, jnp.ones((50, 3))], axis=0)
        h2 = jnp.concatenate([h, jnp.zeros(50)], axis=0)
        pre2 = preintegrate(a2, g2, h2, CALIB)
        np.testing.assert_allclose(np.asarray(pre2.dR), np.asarray(pre1.dR), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pre2.dP), np.asarray(pre1.dP), atol=1e-6)
        np.testing.assert_allclose(float(pre2.dT), float(pre1.dT), atol=1e-6)

    def test_matches_numpy_euler(self, rng):
        n = 400
        a_np = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
        w_np = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
        h = np.full(n, DT, np.float32)
        pre = preintegrate(jnp.asarray(a_np), jnp.asarray(w_np), jnp.asarray(h), CALIB)

        R = np.eye(3); V = np.zeros(3); P = np.zeros(3)
        for i in range(n):
            P = P + V * DT + 0.5 * (R @ a_np[i]) * DT * DT
            V = V + (R @ a_np[i]) * DT
            R = R @ Rotation.from_rotvec(w_np[i] * DT).as_matrix()
        np.testing.assert_allclose(np.asarray(pre.dR), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pre.dV), V, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pre.dP), P, atol=1e-3)

    def test_bias_correction_first_order(self, rng):
        n = 200
        a_np = rng.normal(size=(n, 3)).astype(np.float32)
        w_np = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
        h = jnp.full(n, DT)
        pre0 = preintegrate(jnp.asarray(a_np), jnp.asarray(w_np), h, CALIB)

        db = np.asarray([2e-3, -1e-3, 1.5e-3], np.float32)
        bias = ImuBias(jnp.asarray(db), jnp.asarray(db * 2))
        # Oracle: re-integrate with measurements corrected by the new bias.
        pre1 = preintegrate(
            jnp.asarray(a_np - db * 2), jnp.asarray(w_np - db), h, CALIB
        )
        np.testing.assert_allclose(
            np.asarray(delta_rotation(pre0, bias)), np.asarray(pre1.dR), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(delta_velocity(pre0, bias)), np.asarray(pre1.dV), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(delta_position(pre0, bias)), np.asarray(pre1.dP), atol=2e-3
        )

    def test_covariance_psd_and_growing(self):
        a, g, h = const_inputs(200, [0.1, 0.2, 9.9], [0.01, 0.02, 0.03])
        pre = preintegrate(a, g, h, CALIB)
        C = np.asarray(pre.C)
        np.testing.assert_allclose(C, C.T, atol=1e-10)
        eig = np.linalg.eigvalsh(C)
        assert eig.min() > -1e-12
        assert np.trace(C[:9, :9]) > 0

    def test_predict_state_free_fall(self):
        # Body at rest, accelerometer measures -gravity reaction = +g in z.
        n = 200
        a = jnp.tile(jnp.asarray([[0.0, 0.0, GRAVITY_VALUE]]), (n, 1))
        g = jnp.zeros((n, 3))
        h = jnp.full(n, DT)
        pre = preintegrate(a, g, h, CALIB)
        R0 = jnp.eye(3); v0 = jnp.zeros(3); p0 = jnp.zeros(3)
        R2, v2, p2 = predict_state(R0, v0, p0, pre, ImuBias.zero())
        # Stationary body: gravity and measured specific force cancel.
        np.testing.assert_allclose(np.asarray(v2), 0.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(p2), 0.0, atol=1e-3)

    def test_incremental_matches_batch(self, rng):
        n = 128
        a = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.2)
        h = jnp.full(n, DT)
        pre_batch = preintegrate(a, w, h, CALIB)
        pre_inc = Preintegrated.identity()
        pre_inc = integrate_measurements(pre_inc, a[:64], w[:64], h[:64], CALIB)
        pre_inc = integrate_measurements(pre_inc, a[64:], w[64:], h[64:], CALIB)
        np.testing.assert_allclose(
            np.asarray(pre_inc.dR), np.asarray(pre_batch.dR), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pre_inc.dP), np.asarray(pre_batch.dP), atol=1e-5
        )


class TestFrameBoundaryCoverage:
    """Tracker._preintegrate_imu must cover EXACTLY the frame-to-frame
    interval even when sample timestamps float-jitter across frame
    boundaries (Tracking.cc:1731-1772 tstep split). A one-sample coverage
    mismatch puts g*ddt ~ 0.05 m/s of systematic error into every inertial
    edge (~100 sigma), which the VI optimizer absorbs as bias drift."""

    def _tracker_stub(self):
        from fasttrack_tpu.tracking import Tracker

        t = Tracker.__new__(Tracker)
        t.imu_queue = []
        t.pre_from_kf = None
        t.pre_from_frame = None
        t.bias = (np.zeros(3), np.zeros(3))
        t.last_imu_time = None
        t._last_preint_ts = None
        t.imu_calib = ImuCalib.default(freq=200.0)
        return t

    def test_jittered_boundaries_cover_frame_dt(self):
        t = self._tracker_stub()
        rng = np.random.default_rng(0)
        # sample times with +-5e-14 jitter so some land epsilon above the
        # frame timestamps (the np.arange failure mode: 142/399 frames get
        # != 10 samples without the boundary split)
        ts = np.arange(1, 201) * 0.005 + rng.uniform(-5e-14, 5e-14, 200)
        acc = rng.normal(0, 1, (200, 3))
        gyr = rng.normal(0, 0.1, (200, 3))
        worst = 0.0
        for i in range(1, 20):
            f_ts = i * 0.05
            t.grab_imu([(ts[j], acc[j], gyr[j])
                        for j in range(200)
                        if (i - 1) * 0.05 < ts[j] + 2.5e-3
                        and ts[j] - 2.5e-3 <= f_ts])
            # dedup: grab everything <= f_ts not yet queued is enough for
            # the test; duplicates are prevented by the queue drain below
            t.imu_queue = [s for s in t.imu_queue if s[0] > ((i - 1) * 0.05)]
            t._preintegrate_imu(f_ts)
            if t.pre_from_frame is not None and i > 1:
                worst = max(worst, abs(float(t.pre_from_frame.dT) - 0.05))
        assert worst < 1e-8, worst

    def test_exact_boundaries_unchanged(self):
        """ns-quantized streams (disk loaders) where the boundary sample
        equals the frame timestamp must not grow extra fill steps."""
        t = self._tracker_stub()
        ts = np.arange(1, 41) * 0.005
        for i in range(1, 4):
            f_ts = i * 0.05
            t.grab_imu([(x, np.zeros(3), np.zeros(3))
                        for x in ts if (i - 1) * 0.05 < x <= f_ts])
            t._preintegrate_imu(f_ts)
            if i > 1:
                assert abs(float(t.pre_from_frame.dT) - 0.05) < 1e-12
