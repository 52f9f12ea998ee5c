"""Distributed bundle adjustment + sharded frame extraction over a Mesh.

The multi-host / multi-chip scaling design (SURVEY.md section 2.4 north
star): landmarks shard across devices along the mesh axis "map"; each device
builds the Schur contributions of its landmark shard and the reduced camera
system is formed with one psum over ICI; the (small, dense) 6K x 6K solve is
replicated, point back-substitution stays local to each shard. Frame batches
shard across the same axis for parallel ORB extraction ("frame" parallelism
— the multi-stream analog).

No NCCL/MPI anywhere: XLA inserts the collectives from shard_map specs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map around; prefer the public name
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod
except Exception:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from fasttrack_tpu.cameras.models import Camera, project
from fasttrack_tpu.geometry import SE3, se3_apply, se3_compose, se3_exp
from fasttrack_tpu.optim.local_ba import BAProblem
from fasttrack_tpu.optim.robust import CHI2_MONO, CHI2_STEREO, huber_weight


def make_mesh(n_devices: int | None = None, axis: str = "map") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _ba_shard_step(
    cam: Camera, bf, lam, axis: str,
    poses_R, poses_t, points, obs_uv, obs_ur, inv_sigma2, mask, cam_free, point_free,
):
    """One damped GN iteration; runs on each device over its landmark shard.

    All "l" (landmark) dims are per-shard; the (K,6,6)/(K,6) camera-system
    contributions reduce with psum over the mesh axis.
    """
    K = poses_R.shape[0]
    poses = SE3(poses_R, poses_t)
    is_stereo = obs_ur >= 0
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    # Residuals for the local shard.
    Xc = se3_apply(SE3(poses.R[None], poses.t[None]), points[:, None, :])
    uv = project(cam, Xc)
    z = jnp.maximum(Xc[..., 2], 1e-6)
    ur = uv[..., 0] - bf / z
    r = jnp.stack(
        [
            obs_uv[..., 0] - uv[..., 0],
            obs_uv[..., 1] - uv[..., 1],
            jnp.where(is_stereo, obs_ur - ur, 0.0),
        ],
        axis=-1,
    )
    behind = Xc[..., 2] <= 0.05
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    w = huber_weight(chi2, delta2) * inv_sigma2 * mask * (~behind)

    # Jacobians via autodiff, vmapped over (l, k).
    def res_one(xi, dX, R, t, X, uvo, uro):
        T = se3_compose(se3_exp(xi), SE3(R, t))
        Xc1 = se3_apply(T, X + dX)
        uvp = project(cam, Xc1)
        z1 = jnp.maximum(Xc1[2], 1e-6)
        urp = uvp[0] - bf / z1
        return jnp.stack(
            [uvo[0] - uvp[0], uvo[1] - uvp[1], jnp.where(uro >= 0, uro - urp, 0.0)]
        )

    z6 = jnp.zeros(6, dtype=points.dtype)
    z3 = jnp.zeros(3, dtype=points.dtype)

    def pair(R, t, X, uvo, uro):
        return (
            jax.jacfwd(res_one, argnums=0)(z6, z3, R, t, X, uvo, uro),
            jax.jacfwd(res_one, argnums=1)(z6, z3, R, t, X, uvo, uro),
        )

    f = jax.vmap(
        jax.vmap(pair, in_axes=(0, 0, None, 0, 0)),
        in_axes=(None, None, 0, 0, 0),
    )
    Jc, Jp = f(poses.R, poses.t, points, obs_uv, obs_ur)

    Hcc = jnp.einsum("lkri,lkrj,lk->kij", Jc, Jc, w)
    Hpp = jnp.einsum("lkri,lkrj,lk->lij", Jp, Jp, w)
    Hcp = jnp.einsum("lkri,lkrj,lk->lkij", Jc, Jp, w)
    bc = jnp.einsum("lkri,lkr,lk->ki", Jc, r, w)
    bp = jnp.einsum("lkri,lkr,lk->li", Jp, r, w)

    Hpp_inv = jnp.linalg.inv(Hpp + (lam + 1e-8) * jnp.eye(3, dtype=points.dtype)[None])
    W_ = jnp.einsum("lkij,ljm->lkim", Hcp, Hpp_inv)
    S_local = -jnp.einsum("lkim,lqjm->kqij", W_, Hcp)
    rhs_local = bc - jnp.einsum("lkim,lm->ki", W_, bp)

    # ICI reduction: every device gets the full reduced camera system.
    S = jax.lax.psum(S_local, axis)
    rhs = jax.lax.psum(rhs_local, axis)
    Hcc_tot = jax.lax.psum(Hcc, axis)
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        Hcc_tot + (lam + 1e-8) * jnp.eye(6, dtype=points.dtype)[None]
    )

    free = cam_free
    fmask = free[:, None] & free[None, :]
    S = jnp.where(fmask[:, :, None, None], S, 0.0)
    S = S.at[jnp.arange(K), jnp.arange(K)].set(
        jnp.where(
            free[:, None, None],
            S[jnp.arange(K), jnp.arange(K)],
            jnp.eye(6, dtype=points.dtype)[None],
        )
    )
    rhs = jnp.where(free[:, None], rhs, 0.0)

    Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    dxc = jnp.linalg.solve(Sd, -rhs.reshape(-1)).reshape(K, 6)

    rhs_p = -bp - jnp.einsum("lkij,ki->lj", Hcp, dxc)
    dxp = jnp.einsum("lij,lj->li", Hpp_inv, rhs_p)
    dxp = jnp.where(point_free[:, None], dxp, 0.0)

    poses_new = jax.vmap(lambda xi, R, t: se3_compose(se3_exp(xi), SE3(R, t)))(
        dxc, poses.R, poses.t
    )
    return poses_new.R, poses_new.t, points + dxp


@functools.lru_cache(maxsize=None)
def _build_ba_fn(mesh: Mesh, axis: str, cam_static: tuple):
    """Cache the jitted shard_map program per (mesh, axis, camera kind) so
    repeated BA iterations hit the XLA executable cache instead of
    re-tracing (shapes are handled by jit's own cache)."""
    kind, width, height = cam_static
    shard = P(axis)
    rep = P()

    def fn(cam_params, bf, lam, poses_R, poses_t, points, obs_uv, obs_ur,
           inv_sigma2, mask, cam_free, point_free):
        cam = Camera(kind, cam_params, width, height)
        return _ba_shard_step(
            cam, bf, lam, axis,
            poses_R, poses_t, points, obs_uv, obs_ur, inv_sigma2, mask,
            cam_free, point_free,
        )

    mapped = shard_map(
        fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, shard, shard, shard, shard, shard,
                  rep, shard),
        out_specs=(rep, rep, shard),
        check_vma=False,
    )
    return jax.jit(mapped)


def distributed_ba_iteration(
    problem: BAProblem, cam: Camera, bf, mesh: Mesh, lam: float = 1e-4,
    axis: str = "map",
):
    """One damped GN iteration of the BA window, landmarks sharded over
    `axis`. Returns (poses, points) with the same (global) shapes."""
    lamv = jnp.asarray(lam, problem.points.dtype)
    mapped = _build_ba_fn(mesh, axis, (cam.kind, cam.width, cam.height))
    R, t, pts = mapped(
        cam.params, jnp.asarray(bf, problem.points.dtype), lamv,
        problem.poses.R, problem.poses.t, problem.points,
        problem.obs_uv, problem.obs_ur, problem.inv_sigma2,
        problem.mask, problem.cam_free, problem.point_free,
    )
    return SE3(R, t), pts


def sharded_extract_batch(images: jnp.ndarray, config, mesh: Mesh, axis: str = "map"):
    """Extract ORB features for a batch of frames, frames sharded over the
    mesh (per-host tracking streams feeding a shared map)."""
    from fasttrack_tpu.ops.extractor import extract_orb

    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(images, sharding)

    @jax.jit
    def run(imgs):
        kps, _ = jax.vmap(lambda im: extract_orb(im, config))(imgs)
        return kps

    return run(images)
