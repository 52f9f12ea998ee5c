"""Masked search-by-projection matching — the workhorse of tracking.

Parity targets:
- SearchLocalPointsKernel.cu:71-344 (map-point -> frame matching for
  TrackLocalMap; radius/level-gated best + second-best Hamming with the
  level-aware ratio test, ORBmatcher.cc:227-309).
- PoseEstimationKernel.cu:61-348 (last-frame -> current-frame matching for
  TrackWithMotionModel with forward/backward octave gating,
  ORBmatcher.cc:1775-2085) including the rotation-histogram consistency
  filter (ComputeThreeMaxima, ORBmatcher.cc:2210).

TPU-first design: instead of walking a 64x48 grid per query (scalar gathers),
we compute the full (M, N) Hamming matrix as ONE int8 MXU matmul and apply
the window / level / taken masks as VPU selects. M<=25k queries x N~1k-2k
keypoints x 256 bits is ~10-50 MFLOP-equivalent — far below one MXU pass's
cost at these sizes, so the dense form is both simpler and faster than any
sparse emulation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fasttrack_tpu.ops.hamming import hamming_matrix

TH_HIGH = 100  # ORBmatcher.cc:41
TH_LOW = 50    # ORBmatcher.cc:42
HISTO_LENGTH = 30
BIG = jnp.int32(1 << 20)


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # (M,) int32 best frame-keypoint index (undefined if !ok)
    dist: jnp.ndarray   # (M,) int32 best Hamming distance
    ok: jnp.ndarray     # (M,) bool


@functools.partial(jax.jit, static_argnames=("max_dist", "ratio"))
def search_by_projection(
    q_uv: jnp.ndarray,        # (M, 2) projected query positions, level-0 px
    q_desc: jnp.ndarray,      # (M, 256) int8 signed descriptors
    q_radius: jnp.ndarray,    # (M,) search window radius (px)
    q_level_min: jnp.ndarray, # (M,) int32 inclusive octave gate
    q_level_max: jnp.ndarray, # (M,) int32 inclusive
    q_valid: jnp.ndarray,     # (M,) bool
    kp_uv: jnp.ndarray,       # (N, 2) frame keypoint positions
    kp_desc: jnp.ndarray,     # (N, 256) int8
    kp_level: jnp.ndarray,    # (N,) int32
    kp_valid: jnp.ndarray,    # (N,) bool
    kp_taken: jnp.ndarray | None = None,  # (N,) bool: already bound to a map point
    max_dist: int = TH_HIGH,
    ratio: float | None = None,           # level-aware second-best ratio (0.8 SLP)
) -> MatchResult:
    """Best-match search with square-window + octave gating.

    The window test is the square |du|<=r, |dv|<=r — identical to the
    reference's Frame::GetFeaturesInArea gate.
    """
    d = hamming_matrix(q_desc, kp_desc)  # (M, N) int32

    du = jnp.abs(kp_uv[None, :, 0] - q_uv[:, None, 0])
    dv = jnp.abs(kp_uv[None, :, 1] - q_uv[:, None, 1])
    in_window = (du <= q_radius[:, None]) & (dv <= q_radius[:, None])
    in_level = (kp_level[None, :] >= q_level_min[:, None]) & (
        kp_level[None, :] <= q_level_max[:, None]
    )
    mask = in_window & in_level & kp_valid[None, :] & q_valid[:, None]
    if kp_taken is not None:
        mask = mask & ~kp_taken[None, :]

    dm = jnp.where(mask, d, BIG)
    best_idx = jnp.argmin(dm, axis=1).astype(jnp.int32)
    best_dist = jnp.take_along_axis(dm, best_idx[:, None], axis=1)[:, 0]
    ok = best_dist <= max_dist

    if ratio is not None:
        best_level = kp_level[best_idx]
        dm2 = dm.at[jnp.arange(dm.shape[0]), best_idx].set(BIG)
        second_idx = jnp.argmin(dm2, axis=1).astype(jnp.int32)
        second_dist = jnp.take_along_axis(dm2, second_idx[:, None], axis=1)[:, 0]
        second_level = kp_level[second_idx]
        # ORBmatcher.cc:293-296: apply the ratio only when best and second
        # best live on the same pyramid level.
        reject = (best_level == second_level) & (
            best_dist.astype(jnp.float32) > ratio * second_dist.astype(jnp.float32)
        )
        ok = ok & ~reject

    return MatchResult(best_idx, best_dist, ok)


def rotation_consistency(
    q_angle: jnp.ndarray,   # (M,) reference angles (e.g. last-frame keypoints)
    kp_angle: jnp.ndarray,  # (N,) current-frame keypoint angles
    res: MatchResult,
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 dominant
    30-bin histogram buckets (ORBmatcher.cc ComputeThreeMaxima :2210)."""
    dtheta = q_angle - kp_angle[res.idx]
    frac = (dtheta / (2 * jnp.pi)) % 1.0
    bins = jnp.clip((frac * HISTO_LENGTH).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    hist = jnp.sum(
        jax.nn.one_hot(bins, HISTO_LENGTH, dtype=jnp.int32)
        * res.ok[:, None].astype(jnp.int32),
        axis=0,
    )
    top3 = jax.lax.top_k(hist, 3)[0]
    # ORBmatcher: drop bins 2/3 when much weaker than the best bin.
    keep2 = top3[1].astype(jnp.float32) >= 0.1 * top3[0].astype(jnp.float32)
    keep3 = top3[2].astype(jnp.float32) >= 0.1 * top3[0].astype(jnp.float32)
    order = jnp.argsort(-hist)
    allowed = (bins == order[0]) | (keep2 & (bins == order[1])) | (
        keep3 & (bins == order[2])
    )
    return res.ok & allowed


@jax.jit
def twm_match(
    q_uv, q_desc, q_radius, q_level_min, q_level_max, q_valid,
    kp_uv, kp_desc, kp_level, kp_valid, q_angle, kp_angle,
):
    """TrackWithMotionModel matcher: search + rotation-histogram filter +
    per-keypoint dedup, as ONE compiled program (eager per-op dispatch over
    the device link costs ~40x the compute here)."""
    res = search_by_projection(
        q_uv, q_desc, q_radius, q_level_min, q_level_max, q_valid,
        kp_uv, kp_desc, kp_level, kp_valid,
    )
    keep = rotation_consistency(q_angle, kp_angle, res)
    keep = keep & resolve_duplicates(res._replace(ok=keep), kp_uv.shape[0])
    return res.idx, keep


@jax.jit
def tlm_match(
    q_uv, q_desc, q_radius, q_level_min, q_level_max, q_valid,
    kp_uv, kp_desc, kp_level, kp_valid, kp_taken,
):
    """TrackLocalMap matcher: search with taken-mask + level-aware ratio +
    dedup, one compiled program."""
    res = search_by_projection(
        q_uv, q_desc, q_radius, q_level_min, q_level_max, q_valid,
        kp_uv, kp_desc, kp_level, kp_valid, kp_taken=kp_taken, ratio=0.8,
    )
    keep = res.ok & resolve_duplicates(res, kp_uv.shape[0])
    return res.idx, keep


@jax.jit
def epipolar_match(
    uv1, desc1, free1,        # KF1 keypoints (unbound only: free mask)
    uv2, desc2, free2,        # KF2 keypoints
    F12,                      # (3,3) fundamental with x2^T F12 x1 = 0
    sigma2_2,                 # (N2,) level variance in image 2
):
    """Epipolar-constrained descriptor matching for triangulation
    (ORBmatcher::SearchForTriangulation, ORBmatcher.cc:1006): best Hamming
    match under TH_LOW with the point-to-epiline chi2 gate."""
    d = hamming_matrix(desc1, desc2)  # (N1, N2)
    o1 = jnp.ones((uv1.shape[0], 1), uv1.dtype)
    x1 = jnp.concatenate([uv1, o1], -1)
    lines = x1 @ F12.T  # (N1, 3) epilines in image 2
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * uv2[None, :, 0] + b * uv2[None, :, 1] + c
    dsq = num**2 / jnp.maximum(a**2 + b**2, 1e-12)
    ok_epi = dsq < 3.84 * sigma2_2[None, :]
    mask = ok_epi & free1[:, None] & free2[None, :]
    dm = jnp.where(mask, d, BIG)
    best_idx = jnp.argmin(dm, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(dm, best_idx[:, None], axis=1)[:, 0]
    ok = best <= TH_LOW
    # one-to-one: keep the best row per chosen column
    keep = ok & resolve_duplicates(MatchResult(best_idx, best, ok), uv2.shape[0])
    return best_idx, keep


def resolve_duplicates(res: MatchResult, n_keypoints: int) -> jnp.ndarray:
    """Per-keypoint winner among queries that chose it (min distance), like
    the reference host loop that overwrites F.mvpMapPoints[idx].

    Returns (M,) bool: query keeps its match."""
    m = res.idx.shape[0]
    key = jnp.where(res.ok, res.dist, BIG)
    best_per_kp = jax.ops.segment_min(key, res.idx, num_segments=n_keypoints)
    winner_dist = best_per_kp[res.idx]
    is_winner = res.ok & (key == winner_dist)
    # Break exact-distance ties by query index: first query wins.
    qidx = jnp.arange(m, dtype=jnp.int32)
    tie_key = jnp.where(is_winner, qidx, jnp.int32(1 << 30))
    first_winner = jax.ops.segment_min(tie_key, res.idx, num_segments=n_keypoints)
    return is_winner & (qidx == first_winner[res.idx])
