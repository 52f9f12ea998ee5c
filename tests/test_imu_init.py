"""IMU initialization tests against the analytic synthetic IMU stream."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.imu import ImuBias, ImuCalib, preintegrate
from fasttrack_tpu.imu.init import estimate_gyro_bias, initialize_imu
from fasttrack_tpu.imu.preintegration import GRAVITY_VALUE


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=40, h=32, w=32, fps=20.0, imu_rate=200.0, seed=1)


def make_kf_data(seq, stride=4, gyro_bias=None, acc_bias=None):
    """Sample 'keyframes' every `stride` frames; preintegrate between them."""
    calib = ImuCalib.default(freq=200.0)
    kf_idx = list(range(0, len(seq.frames), stride))
    R_wb = [seq.frames[i].R_wc for i in kf_idx]
    p_w = [seq.frames[i].t_wc for i in kf_idx]
    times = [seq.frames[i].timestamp for i in kf_idx]
    preints = []
    for a, b in zip(times[:-1], times[1:]):
        m = (seq.imu_t > a) & (seq.imu_t <= b)
        acc = seq.imu_acc[m].copy()
        gyro = seq.imu_gyro[m].copy()
        if gyro_bias is not None:
            gyro += gyro_bias
        if acc_bias is not None:
            acc += acc_bias
        dt = np.full(m.sum(), 1.0 / 200.0, np.float32)
        # pad to fixed size
        P = 64
        acc = np.pad(acc, ((0, P - len(acc)), (0, 0)))
        gyro = np.pad(gyro, ((0, P - len(gyro)), (0, 0)))
        dt = np.pad(dt, (0, P - len(dt)))
        preints.append(
            preintegrate(jnp.asarray(acc), jnp.asarray(gyro), jnp.asarray(dt),
                         calib, ImuBias.zero())
        )
    return R_wb, p_w, preints


class TestGyroBias:
    def test_zero_bias(self, seq):
        R_wb, p_w, preints = make_kf_data(seq)
        bg = estimate_gyro_bias(R_wb, preints)
        assert np.abs(bg).max() < 5e-3, bg

    def test_recovers_injected_bias(self, seq):
        true_bg = np.array([0.02, -0.015, 0.01], np.float32)
        R_wb, p_w, preints = make_kf_data(seq, gyro_bias=true_bg)
        bg = estimate_gyro_bias(R_wb, preints)
        np.testing.assert_allclose(bg, true_bg, atol=4e-3)


class TestImuInit:
    def test_gravity_and_velocities(self, seq):
        R_wb, p_w, preints = make_kf_data(seq)
        res = initialize_imu(R_wb, p_w, preints)
        assert res.success
        # synthetic world is already gravity-aligned: g ~ (0,0,-9.81)
        np.testing.assert_allclose(
            res.gravity_w, [0, 0, -GRAVITY_VALUE], atol=0.3
        )
        # R_gw should be near identity
        assert np.abs(res.R_gw - np.eye(3)).max() < 0.05
        # velocity check vs numerical derivative at an interior keyframe
        k = 3
        i = k * 4
        v_num = (seq.frames[i + 1].t_wc - seq.frames[i - 1].t_wc) * 20.0 / 2
        np.testing.assert_allclose(res.velocities[k], v_num, atol=0.15)

    def test_mono_scale_recovery(self, seq):
        R_wb, p_w, preints = make_kf_data(seq)
        s_true = 0.4  # visual positions under-scaled by this factor
        p_scaled = [p * s_true for p in p_w]
        res = initialize_imu(R_wb, p_scaled, preints, mono_scale=True)
        assert res.success
        np.testing.assert_allclose(res.scale, 1.0 / s_true, rtol=0.05)

    def test_with_gyro_bias(self, seq):
        true_bg = np.array([0.01, 0.02, -0.01], np.float32)
        R_wb, p_w, preints = make_kf_data(seq, gyro_bias=true_bg)
        res = initialize_imu(R_wb, p_w, preints)
        assert res.success
        np.testing.assert_allclose(res.bg, true_bg, atol=5e-3)
        np.testing.assert_allclose(
            res.gravity_w, [0, 0, -GRAVITY_VALUE], atol=0.4
        )
