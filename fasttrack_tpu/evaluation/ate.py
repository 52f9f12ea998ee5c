"""Absolute trajectory error with Umeyama SE3/Sim3 alignment.

The reference's eval harness calls a (missing) evaluate3.py ATE script
(Examples/euroc_eval_examples.sh:62); this module is our in-tree equivalent:
timestamp association, least-squares alignment (optionally with scale for
monocular), and RMSE/statistics.
"""

from __future__ import annotations

import numpy as np


def associate_trajectories(
    t_est: np.ndarray, p_est: np.ndarray, t_gt: np.ndarray, p_gt: np.ndarray,
    max_dt: float = 0.02,
):
    """Associate by nearest timestamp. Returns (p_est_a, p_gt_a)."""
    idx = np.searchsorted(t_gt, t_est)
    idx = np.clip(idx, 1, len(t_gt) - 1)
    left = idx - 1
    choose_left = np.abs(t_gt[left] - t_est) < np.abs(t_gt[idx] - t_est)
    nearest = np.where(choose_left, left, idx)
    ok = np.abs(t_gt[nearest] - t_est) <= max_dt
    return p_est[ok], p_gt[nearest[ok]]


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform dst ~= s R src + t (Umeyama 1991).

    Returns (s, R, t)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def absolute_trajectory_error(
    t_est: np.ndarray, p_est: np.ndarray, t_gt: np.ndarray, p_gt: np.ndarray,
    with_scale: bool = False, max_dt: float = 0.02,
):
    """Returns dict with rmse/mean/median/std/min/max of the aligned ATE."""
    pe, pg = associate_trajectories(t_est, p_est, t_gt, p_gt, max_dt)
    if len(pe) < 3:
        return {"rmse": np.inf, "n": len(pe)}
    s, R, t = umeyama_alignment(pe, pg, with_scale)
    aligned = (s * (R @ pe.T)).T + t
    err = np.linalg.norm(aligned - pg, axis=1)
    return {
        "rmse": float(np.sqrt((err**2).mean())),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "std": float(err.std()),
        "min": float(err.min()),
        "max": float(err.max()),
        "n": int(len(err)),
        "scale": s,
    }
