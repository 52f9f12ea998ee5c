"""Stereo rig helpers: rectified-stereo depth and fisheye triangulation.

Parity targets:
- rectified stereo: Frame.cc mbf/mb usage (depth = bf / disparity).
- fisheye: KannalaBrandt8::TriangulateMatches (KannalaBrandt8.cpp:306-393):
  parallax-gated two-view DLT triangulation with reprojection checks, used to
  validate fisheye stereo matches and give them a depth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from fasttrack_tpu.cameras.models import Camera, project, unproject
from fasttrack_tpu.geometry import SE3, se3_apply, se3_inverse


class StereoRig(NamedTuple):
    left: Camera
    right: Camera
    T_rl: SE3  # right <- left (the reference's mTrl, Frame.h:72-74)
    bf: jnp.ndarray  # baseline * fx (reference mbf)

    @property
    def baseline(self):
        return jnp.linalg.norm(self.T_rl.t)


def make_rectified_rig(cam: Camera, bf: float) -> StereoRig:
    from fasttrack_tpu.geometry import se3_identity

    T = se3_identity()
    b = float(bf) / float(cam.params[0])
    T = SE3(T.R, jnp.asarray([-b, 0.0, 0.0], dtype=jnp.float32))
    return StereoRig(cam, cam, T, jnp.asarray(bf, dtype=jnp.float32))


def triangulate_two_view(
    ray1: jnp.ndarray, ray2: jnp.ndarray, T_21: SE3
) -> jnp.ndarray:
    """DLT triangulation of bearing rays in camera-1 coordinates.

    ray1/ray2: (..., 3) rays with z=1 in their own camera frames;
    T_21: camera2 <- camera1. Returns 3D points in camera-1 frame.
    Mirrors GeometricTools::Triangulate (GeometricTools.h:37-40) but batched:
    builds the 4x4 DLT system and solves via the null space (SVD).
    """
    batch = ray1.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=ray1.dtype), (*batch, 3, 3))
    zeros = jnp.zeros((*batch, 3), dtype=ray1.dtype)
    # P1 = [I | 0], P2 = [R | t]
    P1 = jnp.concatenate([eye, zeros[..., None]], axis=-1)
    R2 = jnp.broadcast_to(T_21.R, (*batch, 3, 3))
    t2 = jnp.broadcast_to(T_21.t, (*batch, 3))
    P2 = jnp.concatenate([R2, t2[..., None]], axis=-1)

    def two_rows(ray, P):
        x, y = ray[..., 0:1], ray[..., 1:2]
        r0 = x * P[..., 2, :] - P[..., 0, :]
        r1 = y * P[..., 2, :] - P[..., 1, :]
        return jnp.stack([r0, r1], axis=-2)

    A = jnp.concatenate([two_rows(ray1, P1), two_rows(ray2, P2)], axis=-2)
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / safe_w[..., None]


def triangulate_matches(
    rig: StereoRig,
    kp_left: jnp.ndarray,   # (..., 2) pixels in left image
    kp_right: jnp.ndarray,  # (..., 2) pixels in right image
    sigma2_left: jnp.ndarray,
    sigma2_right: jnp.ndarray,
    min_parallax_cos: float = 0.9998,
    chi2_thresh: float = 5.991,
):
    """Fisheye stereo match validation (KannalaBrandt8.cpp:306-393).

    Returns (depth_left, X_left, valid): depth of the point in the left
    camera, the 3D point, and a validity mask combining the parallax gate,
    positive depths, and both reprojection chi2 checks.
    """
    r1 = unproject(rig.left, kp_left)
    r2 = unproject(rig.right, kp_right)
    r1n = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    # Rotate ray2 into the left frame for the parallax test.
    T_lr = se3_inverse(rig.T_rl)
    r2_in_l = jnp.einsum("ij,...j->...i", T_lr.R, r2)
    r2n = r2_in_l / jnp.linalg.norm(r2_in_l, axis=-1, keepdims=True)
    cos_parallax = jnp.sum(r1n * r2n, axis=-1)

    X = triangulate_two_view(r1, r2, rig.T_rl)
    z1 = X[..., 2]
    X_in_r = se3_apply(rig.T_rl, X)
    z2 = X_in_r[..., 2]

    uv1 = project(rig.left, X)
    uv2 = project(rig.right, X_in_r)
    err1 = jnp.sum((uv1 - kp_left) ** 2, axis=-1) / jnp.maximum(sigma2_left, 1e-9)
    err2 = jnp.sum((uv2 - kp_right) ** 2, axis=-1) / jnp.maximum(sigma2_right, 1e-9)

    valid = (
        (cos_parallax < min_parallax_cos)
        & (z1 > 0)
        & (z2 > 0)
        & (err1 < chi2_thresh)
        & (err2 < chi2_thresh)
    )
    return z1, X, valid
