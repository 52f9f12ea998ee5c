"""IMU types and preintegration (the reference's src/ImuTypes.cc)."""

from fasttrack_tpu.imu.preintegration import (  # noqa: F401
    GRAVITY_VALUE,
    GRAVITY,
    ImuBias,
    ImuCalib,
    Preintegrated,
    preintegrate,
    integrate_measurements,
    delta_rotation,
    delta_velocity,
    delta_position,
    predict_state,
)
