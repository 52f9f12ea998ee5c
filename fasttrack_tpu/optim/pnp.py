"""RANSAC PnP for relocalization (the reference's MLPnPsolver role,
src/MLPnPsolver.cpp, used only by Tracking::Relocalization).

Bearing-vector DLT (camera-model agnostic like MLPnP: pixels are unprojected
to rays first) inside RANSAC, followed by the device LM pose refinement.
Host NumPy: relocalization is rare and small (N < ~200 matches).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class PnPResult(NamedTuple):
    success: bool
    R_cw: np.ndarray
    t_cw: np.ndarray
    inliers: np.ndarray


def _dlt_pnp(X: np.ndarray, rays: np.ndarray):
    """Minimal DLT: solve P (3x4) from 3D points X and unit-depth rays
    (x, y, 1); decompose into R, t by orthonormalizing."""
    n = len(X)
    A = np.zeros((2 * n, 12))
    for i in range(n):
        Xh = np.append(X[i], 1.0)
        x, y = rays[i, 0], rays[i, 1]
        A[2 * i, 0:4] = Xh
        A[2 * i, 8:12] = -x * Xh
        A[2 * i + 1, 4:8] = Xh
        A[2 * i + 1, 8:12] = -y * Xh
    _, _, Vt = np.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    # scale & orthonormalize
    U, S, Vt2 = np.linalg.svd(M)
    det = np.linalg.det(U @ Vt2)
    R = U @ np.diag([1, 1, det]) @ Vt2
    scale = np.mean(S) * det
    if abs(scale) < 1e-12:
        return None
    t = P[:, 3] / scale
    # enforce positive depth for the majority of points
    depths = (X @ R.T + t)[:, 2]
    if np.median(depths) < 0:
        R = U @ np.diag([1, 1, -det]) @ Vt2
        t = -t
    return R, t


def ransac_pnp(
    X: np.ndarray,        # (N, 3) world points
    rays: np.ndarray,     # (N, 3) unprojected unit-depth rays (z=1)
    sigma2: np.ndarray,   # (N,) per-obs pixel variance (for the chi2 gate)
    focal: float,         # focal length to convert ray error to pixels
    iterations: int = 200,
    chi2: float = 5.991,
    min_inliers: int = 12,
    seed: int = 0,
) -> PnPResult:
    n = len(X)
    if n < 6:
        return PnPResult(False, np.eye(3), np.zeros(3), np.zeros(n, bool))
    rng = np.random.default_rng(seed)
    best = None
    for _ in range(iterations):
        idx = rng.choice(n, 6, replace=False)
        out = _dlt_pnp(X[idx], rays[idx])
        if out is None:
            continue
        R, t = out
        Xc = X @ R.T + t
        z = Xc[:, 2]
        ok_z = z > 0.05
        pr = Xc[:, :2] / np.maximum(z[:, None], 1e-9)
        err = ((pr - rays[:, :2]) ** 2).sum(1) * focal * focal / sigma2
        inl = ok_z & (err < chi2)
        ni = int(inl.sum())
        if best is None or ni > best[0]:
            best = (ni, R, t, inl)
        if ni > 0.7 * n:
            break
    ni, R, t, inl = best
    if ni < min_inliers:
        return PnPResult(False, R, t, inl)
    out = _dlt_pnp(X[inl], rays[inl])
    if out is not None:
        R, t = out
        Xc = X @ R.T + t
        z = Xc[:, 2]
        pr = Xc[:, :2] / np.maximum(z[:, None], 1e-9)
        err = ((pr - rays[:, :2]) ** 2).sum(1) * focal * focal / sigma2
        inl = (z > 0.05) & (err < chi2)
    return PnPResult(True, R, t, inl)
