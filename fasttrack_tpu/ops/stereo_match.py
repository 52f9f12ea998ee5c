"""Rectified and fisheye stereo descriptor matching.

Parity targets:
- findBestStereoMatchKernel (StereoMatchKernel.cu:151-199): per left
  keypoint, scan row-bucketed right keypoints within the disparity window,
  Hamming best match (TH_HIGH gate, octave gate +-1).
- refineStereoMatchKernel (StereoMatchKernel.cu:201-309): cooperative 11x11
  patch L1 correlation over +-5 px at the keypoint's octave, parabola
  sub-pixel fit -> mvuRight / mvDepth; followed by the host median-distance
  outlier cull (Frame.cc:1007-1063).
- fisheyeStereoMatchKernel (StereoMatchKernel.cu:311-348): brute-force
  all-pairs Hamming with the Lowe 0.7 ratio test.

TPU-first design: the row-bucket scan becomes a full (N_L, N_R) MXU Hamming
matmul with a row-window mask |y_L - y_R| <= 2*scale_L (the bucket radius,
Frame.cc ComputeStereoMatches) and a disparity-window mask; the cooperative
shared-memory refinement becomes a vmapped gather of 11x11 patches at 11
integer shifts with a closed-form parabola fit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fasttrack_tpu.ops.hamming import hamming_matrix

TH_HIGH = 100
BIG = jnp.int32(1 << 20)
W_PATCH = 5   # half window (11x11 patch), StereoMatchKernel refine
L_SHIFT = 5   # +-5 px sub-pixel search


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray  # (N,) float32, -1 where unmatched
    depth: jnp.ndarray    # (N,) float32, -1 where unmatched
    valid: jnp.ndarray    # (N,) bool


@jax.jit
def match_rectified(
    # left keypoints
    l_uv: jnp.ndarray,      # (N, 2) level-0 coords (undistorted/rectified)
    l_level: jnp.ndarray,   # (N,)
    l_desc: jnp.ndarray,    # (N, 256) int8
    l_valid: jnp.ndarray,   # (N,)
    # right keypoints
    r_uv: jnp.ndarray,      # (M, 2)
    r_level: jnp.ndarray,   # (M,)
    r_desc: jnp.ndarray,    # (M, 256) int8
    r_valid: jnp.ndarray,   # (M,)
    # pyramids (raw level tensors) for sub-pixel refinement
    l_pyr: jnp.ndarray,     # (L, H, W)
    r_pyr: jnp.ndarray,     # (L, H, W)
    l_xl: jnp.ndarray,      # (N,) int32 left kp coords at native level
    l_yl: jnp.ndarray,      # (N,)
    scale_factors: jnp.ndarray,  # (L,)
    bf: jnp.ndarray,        # baseline * fx
    min_z: jnp.ndarray,     # baseline (minZ = b, Frame.cc:842)
) -> StereoMatches:
    """One-shot rectified stereo matching + refinement + median cull."""
    n = l_uv.shape[0]
    d = hamming_matrix(l_desc, r_desc)  # (N, M)

    # Row window: |yR - yL| <= 2 * scale_L (the reference's row-bucket
    # radius, Frame.cc ComputeStereoMatches vRowIndices fill).
    r_row = 2.0 * scale_factors[l_level]
    dy = jnp.abs(r_uv[None, :, 1] - l_uv[:, None, 1])
    in_row = dy <= r_row[:, None]

    # Disparity window: uR in [uL - maxD, uL - minD], minD=0, maxD=bf/minZ.
    max_d = bf / min_z
    du = l_uv[:, None, 0] - r_uv[None, :, 0]  # = disparity if matched
    in_disp = (du >= -3.0) & (du <= max_d)    # small negative slack pre-refine

    in_level = jnp.abs(r_level[None, :] - l_level[:, None]) <= 1
    mask = in_row & in_disp & in_level & l_valid[:, None] & r_valid[None, :]
    dm = jnp.where(mask, d, BIG)
    best_idx = jnp.argmin(dm, axis=1).astype(jnp.int32)
    best_dist = jnp.take_along_axis(dm, best_idx[:, None], axis=1)[:, 0]
    matched = best_dist <= TH_HIGH

    # --- sub-pixel refinement at the left keypoint's octave -----------------
    inv_scale = 1.0 / scale_factors
    uR0 = r_uv[best_idx, 0]
    scaled_uR = uR0 * inv_scale[l_level]  # right u at left's octave

    P = 2 * W_PATCH + 1
    S = 2 * L_SHIFT + 1

    safe_y = jnp.clip(l_yl, W_PATCH, l_pyr.shape[1] - W_PATCH - 1)
    safe_x = jnp.clip(l_xl, W_PATCH + L_SHIFT + 1, l_pyr.shape[2] - W_PATCH - L_SHIFT - 2)
    safe_ur = jnp.clip(scaled_uR, W_PATCH + L_SHIFT + 1, l_pyr.shape[2] - W_PATCH - L_SHIFT - 2)

    # Patch gathers, TPU-style: (a) ONE whole-row gather (major-axis take of
    # contiguous rows — the only gather shape the TPU memory system likes),
    # then (b) per-keypoint column selection as a batched one-hot matmul on
    # the MXU. The earlier vmapped dynamic_slice form was a compile-time
    # bomb (~4 min of XLA time on a v5e for this one op) and lowered to a
    # serialized gather loop at runtime.
    ur0 = jnp.round(safe_ur).astype(jnp.int32)
    WIN = P + 2 * L_SHIFT
    n_kp = l_uv.shape[0]
    L_, H0, W0 = l_pyr.shape

    dy_off = jnp.arange(-W_PATCH, W_PATCH + 1, dtype=jnp.int32)
    row_idx = (l_level * H0 + safe_y)[:, None] + dy_off[None, :]      # (N, P)
    both = jnp.concatenate(
        [l_pyr.reshape(L_ * H0, W0), r_pyr.reshape(L_ * H0, W0)], axis=1
    )                                                                  # (L*H, 2W)
    rows = jnp.take(both, row_idx.reshape(-1), axis=0).reshape(n_kp, P, 2 * W0)
    rows_l = rows[:, :, :W0]
    rows_r = rows[:, :, W0:]

    w_range = jnp.arange(W0, dtype=jnp.int32)
    col_l = (safe_x[:, None] + dy_off[None, :])                        # (N, P)
    oh_l = (w_range[None, :, None] == col_l[:, None, :]).astype(rows.dtype)
    patch_l = jnp.einsum("npw,nwq->npq", rows_l, oh_l,
                         precision=jax.lax.Precision.HIGHEST)          # (N, P, P)
    dx_win = jnp.arange(-W_PATCH - L_SHIFT, W_PATCH + L_SHIFT + 1, dtype=jnp.int32)
    col_r = ur0[:, None] + dx_win[None, :]                             # (N, WIN)
    oh_r = (w_range[None, :, None] == col_r[:, None, :]).astype(rows.dtype)
    win_r = jnp.einsum("npw,nwq->npq", rows_r, oh_r,
                       precision=jax.lax.Precision.HIGHEST)            # (N, P, WIN)
    patch_l = patch_l - patch_l[:, W_PATCH, W_PATCH][:, None, None]
    patch_r = jnp.stack(
        [win_r[:, :, s:s + P] for s in range(S)], axis=1
    )  # (N, S, P, P)
    patch_r = patch_r - patch_r[:, :, W_PATCH, W_PATCH][:, :, None, None]
    sads = jnp.sum(jnp.abs(patch_l[:, None] - patch_r), axis=(-1, -2))  # (N, S)

    k = jnp.argmin(sads, axis=1)
    ok_k = (k > 0) & (k < S - 1)
    km = jnp.clip(k, 1, S - 2)
    take = lambda off: jnp.take_along_axis(sads, (km + off)[:, None], axis=1)[:, 0]
    c1, c2, c3 = take(-1), take(0), take(1)
    denom = jnp.maximum(2.0 * (c1 + c3 - 2.0 * c2), 1e-6)
    delta = (c1 - c3) / denom
    ok_d = jnp.abs(delta) <= 1.0
    ur_ref = ur0.astype(jnp.float32) + (km - L_SHIFT).astype(jnp.float32) + delta
    sad_best = c2
    ok_ref = ok_k & ok_d

    # Back to level-0 coords; disparity & depth gates (Frame.cc:986-1004).
    u_right = ur_ref * scale_factors[l_level]
    disparity = l_uv[:, 0] - u_right
    disparity_ok = (disparity > 0.01) & (disparity < max_d)
    u_right = jnp.where(disparity <= 0.01, l_uv[:, 0] - 0.01, u_right)
    disparity = jnp.maximum(disparity, 0.01)
    depth = bf / disparity

    good = matched & ok_ref & disparity_ok

    # Median-distance cull (Frame.cc:1040-1063): drop matches whose refine
    # SAD exceeds 1.5 * 1.4 * median.
    sad_valid = jnp.where(good, sad_best, jnp.nan)
    med = jnp.nanmedian(sad_valid)
    med = jnp.where(jnp.isnan(med), jnp.inf, med)
    good = good & (sad_best <= 1.5 * 1.4 * med)

    return StereoMatches(
        jnp.where(good, u_right, -1.0),
        jnp.where(good, depth, -1.0),
        good,
    )


class FisheyeMatches(NamedTuple):
    idx_right: jnp.ndarray  # (N,) int32 best right index
    valid: jnp.ndarray      # (N,) bool (Lowe-ratio accepted)


@functools.partial(jax.jit, static_argnames=("ratio", "max_dist"))
def match_fisheye(
    l_desc: jnp.ndarray, l_valid: jnp.ndarray,
    r_desc: jnp.ndarray, r_valid: jnp.ndarray,
    ratio: float = 0.7,
    max_dist: int = TH_HIGH,
) -> FisheyeMatches:
    """Brute-force all-pairs Hamming + Lowe ratio
    (fisheyeStereoMatchKernel, StereoMatchKernel.cu:311-348). Geometry
    validation happens afterwards via cameras.triangulate_matches."""
    d = hamming_matrix(l_desc, r_desc)
    mask = l_valid[:, None] & r_valid[None, :]
    dm = jnp.where(mask, d, BIG)
    best_idx = jnp.argmin(dm, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(dm, best_idx[:, None], axis=1)[:, 0]
    dm2 = dm.at[jnp.arange(dm.shape[0]), best_idx].set(BIG)
    second = jnp.min(dm2, axis=1)
    ok = (best <= max_dist) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    return FisheyeMatches(best_idx, ok)
