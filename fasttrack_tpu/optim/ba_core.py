"""Shared bundle-adjustment math: residuals, Jacobians, Schur blocks.

ONE implementation of the (landmark x camera) BA building blocks, consumed
by both the single-device window solver (optim.local_ba) and the
landmark-sharded distributed solver (parallel.dist_ba) — the distributed
version simply psums the camera-system contributions over the mesh axis
between `schur_camera_contrib` and `assemble_and_solve` (SURVEY.md §2.4).

Parity: the g2o block solver with landmark marginalization the reference
uses everywhere (Optimizer.cc LocalBundleAdjustment :1116 /
GlobalBundleAdjustemnt :52).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fasttrack_tpu.cameras.models import Camera, project
from fasttrack_tpu.geometry import SE3, se3_apply, se3_compose, se3_exp
from fasttrack_tpu.optim.robust import CHI2_MONO, CHI2_STEREO, huber_weight


def residuals(poses: SE3, points, cam: Camera, bf, obs_uv, obs_ur):
    """(L, K, 3) residuals [du, dv, dur] + behind-camera mask."""
    Xc = se3_apply(
        SE3(poses.R[None, :], poses.t[None, :]), points[:, None, :]
    )  # (L, K, 3)
    uv = project(cam, Xc)
    z = jnp.maximum(Xc[..., 2], 1e-6)
    ur = uv[..., 0] - bf / z
    is_stereo = obs_ur >= 0
    r = jnp.stack(
        [
            obs_uv[..., 0] - uv[..., 0],
            obs_uv[..., 1] - uv[..., 1],
            jnp.where(is_stereo, obs_ur - ur, 0.0),
        ],
        axis=-1,
    )
    behind = Xc[..., 2] <= 0.05
    return r, behind


def jacobians(poses: SE3, points, cam: Camera, bf, obs_uv, obs_ur):
    """Per-observation J wrt (camera xi (6), point (3)) via autodiff.
    Returns (L, K, 3, 6) and (L, K, 3, 3)."""

    def res_one(xi, dX, R, t, X, uv, ur):
        T = se3_compose(se3_exp(xi), SE3(R, t))
        Xc = se3_apply(T, X + dX)
        uvp = project(cam, Xc)
        z = jnp.maximum(Xc[2], 1e-6)
        urp = uvp[0] - bf / z
        st = ur >= 0
        return jnp.stack(
            [uv[0] - uvp[0], uv[1] - uvp[1], jnp.where(st, ur - urp, 0.0)]
        )

    z6 = jnp.zeros(6, dtype=points.dtype)
    z3 = jnp.zeros(3, dtype=points.dtype)

    def pair(R, t, X, uv, ur):
        Jc = jax.jacfwd(res_one, argnums=0)(z6, z3, R, t, X, uv, ur)
        Jp = jax.jacfwd(res_one, argnums=1)(z6, z3, R, t, X, uv, ur)
        return Jc, Jp

    f = jax.vmap(
        jax.vmap(pair, in_axes=(0, 0, None, 0, 0)),
        in_axes=(None, None, 0, 0, 0),
    )
    return f(poses.R, poses.t, points, obs_uv, obs_ur)


def robust_weights(r, inlier, inv_sigma2, obs_ur, use_robust):
    """chi2 + per-observation weights with the Huber kernel (masked)."""
    is_stereo = obs_ur >= 0
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    chi2 = jnp.where(inlier > 0, chi2, 0.0)
    w_rob = jnp.where(use_robust, huber_weight(chi2, delta2), 1.0)
    return chi2, w_rob * inv_sigma2 * inlier


def schur_camera_contrib(Jc, Jp, r, w, lam, dtype):
    """Per-landmark-shard Schur contributions.

    Returns (S_off_local, rhs_local, Hcc_local, Hpp_inv, Hcp, bp): the first
    three REDUCE over landmark shards (psum in the distributed solver, no-op
    on one device); the rest stay local for point back-substitution."""
    Hcc = jnp.einsum("lkri,lkrj,lk->kij", Jc, Jc, w)          # (K,6,6)
    Hpp = jnp.einsum("lkri,lkrj,lk->lij", Jp, Jp, w)          # (L,3,3)
    Hcp = jnp.einsum("lkri,lkrj,lk->lkij", Jc, Jp, w)         # (L,K,6,3)
    bc = jnp.einsum("lkri,lkr,lk->ki", Jc, r, w)              # (K,6)
    bp = jnp.einsum("lkri,lkr,lk->li", Jp, r, w)              # (L,3)

    Hpp_d = Hpp + (lam + 1e-8) * jnp.eye(3, dtype=dtype)[None]
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    W_ = jnp.einsum("lkij,ljm->lkim", Hcp, Hpp_inv)           # (L,K,6,3)
    S_off = -jnp.einsum("lkim,lqjm->kqij", W_, Hcp)           # (K,K,6,6)
    rhs = bc - jnp.einsum("lkim,lm->ki", W_, bp)              # (K,6)
    return S_off, rhs, Hcc, Hpp_inv, Hcp, bp


def assemble_and_solve(S_off, rhs, Hcc, lam, cam_free, dtype):
    """Reduced camera system: add damped diagonal, pin fixed cameras, dense
    solve. Inputs are the (already psum-reduced, if distributed) totals."""
    K = Hcc.shape[0]
    S = S_off.at[jnp.arange(K), jnp.arange(K)].add(
        Hcc + (lam + 1e-8) * jnp.eye(6, dtype=dtype)[None]
    )
    free = cam_free
    fmask = free[:, None] & free[None, :]
    S = jnp.where(fmask[:, :, None, None], S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].set(
        jnp.where(
            free[:, None, None],
            S[jnp.arange(K), jnp.arange(K)],
            jnp.eye(6, dtype=dtype)[None],
        )
    )
    rhs = jnp.where(free[:, None], rhs, 0.0)
    Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    dxc = jnp.linalg.solve(Sd, -rhs.reshape(-1)).reshape(K, 6)
    return dxc


def backsub_points(Hpp_inv, Hcp, bp, dxc, point_free):
    """Back-substitute the landmark updates (local to each shard)."""
    rhs_p = -bp - jnp.einsum("lkij,ki->lj", Hcp, dxc)
    dxp = jnp.einsum("lij,lj->li", Hpp_inv, rhs_p)
    return jnp.where(point_free[:, None], dxp, 0.0)


def apply_pose_update(poses: SE3, dxc) -> SE3:
    return SE3(
        *jax.vmap(lambda xi, R, t: se3_compose(se3_exp(xi), SE3(R, t)))(
            dxc, poses.R, poses.t
        )
    )
