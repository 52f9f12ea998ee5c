"""Nonlinear optimization (the reference's g2o usage, re-designed as JAX
Levenberg-Marquardt with masked residuals and Schur-complement reduction)."""

from fasttrack_tpu.optim.robust import huber_weight  # noqa: F401
from fasttrack_tpu.optim.pose_opt import pose_optimize, PoseOptResult  # noqa: F401
from fasttrack_tpu.optim.local_ba import local_bundle_adjustment, BAProblem, BAResult  # noqa: F401
