"""Lie-group math core (the reference's Thirdparty/Sophus, re-designed).

Pure-JAX, fixed-shape, batched over arbitrary leading dimensions; every
function is jit- and vmap-safe. Conventions:

- SO3: rotation matrices (..., 3, 3); tangent phi (..., 3).
- SE3: NamedTuple (R (...,3,3), t (...,3)); tangent [rho, phi] (..., 6)
  (translation part first, like Sophus se3.hpp).
- Sim3: NamedTuple (R, t, s); tangent [rho, phi, sigma] (..., 7).
"""

from fasttrack_tpu.geometry.so3 import (  # noqa: F401
    hat,
    vee,
    so3_exp,
    so3_log,
    so3_left_jacobian,
    so3_right_jacobian,
    quat_to_matrix,
    matrix_to_quat,
)
from fasttrack_tpu.geometry.se3 import (  # noqa: F401
    SE3,
    se3_identity,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_compose,
    se3_apply,
    se3_matrix,
    se3_from_matrix,
)
from fasttrack_tpu.geometry.sim3 import (  # noqa: F401
    Sim3,
    sim3_identity,
    sim3_exp,
    sim3_log,
    sim3_inverse,
    sim3_compose,
    sim3_apply,
    sim3_from_se3,
)
