"""Essential-graph Sim3 pose-graph optimization
(Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:1501).

Host float64 Gauss-Newton over Sim3 vertices with numeric edge Jacobians
(g2o's EdgeSim3 also uses numeric differentiation) and a sparse normal
system solved with scipy. Called only at loop closures / map merges, so
host latency is acceptable and float64 conditioning (SURVEY.md hard parts)
comes for free. `fix_scale=True` freezes the sigma coordinate (stereo /
inertial maps, the reference's bFixScale).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


# --- minimal float64 Sim3 ops (host) ---------------------------------------

def _hat(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _so3_exp(phi):
    th = np.linalg.norm(phi)
    K = _hat(phi)
    if th < 1e-10:
        return np.eye(3) + K + 0.5 * K @ K
    return (
        np.eye(3)
        + np.sin(th) / th * K
        + (1 - np.cos(th)) / th**2 * K @ K
    )


def _so3_log(R):
    tr = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(tr)
    if th < 1e-10:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
        return w
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2 * np.sin(th)) * w


def _calc_W(phi, sigma):
    th = np.linalg.norm(phi)
    s = np.exp(sigma)
    K = _hat(phi)
    KK = K @ K
    eps = 1e-8
    if abs(sigma) < eps:
        C = 1.0
        if th < eps:
            A, B = 0.5, 1.0 / 6.0
        else:
            A = (1 - np.cos(th)) / th**2
            B = (th - np.sin(th)) / th**3
    else:
        C = (s - 1) / sigma
        if th < eps:
            A = ((sigma - 1) * s + 1) / sigma**2
            B = ((0.5 * sigma**2 - sigma + 1) * s - 1) / sigma**3
        else:
            a_ = s * np.sin(th)
            b_ = s * np.cos(th)
            c_ = th**2 + sigma**2
            A = (a_ * sigma + (1 - b_) * th) / (th * c_)
            B = (C - ((b_ - 1) * sigma + a_ * th) / c_) / th**2
    return C * np.eye(3) + A * K + B * KK


def sim3_exp(xi):
    """xi = [rho, phi, sigma] -> (s, R, t)."""
    rho, phi, sigma = xi[:3], xi[3:6], xi[6]
    R = _so3_exp(phi)
    t = _calc_W(phi, sigma) @ rho
    return np.exp(sigma), R, t


def sim3_log(s, R, t):
    phi = _so3_log(R)
    sigma = np.log(s)
    W = _calc_W(phi, sigma)
    rho = np.linalg.solve(W, t)
    return np.concatenate([rho, phi, [sigma]])


def sim3_mul(a, b):
    sa, Ra, ta = a
    sb, Rb, tb = b
    return (sa * sb, Ra @ Rb, sa * Ra @ tb + ta)


def sim3_inv(a):
    s, R, t = a
    si = 1.0 / s
    Ri = R.T
    return (si, Ri, -si * Ri @ t)


def optimize_essential_graph_4dof(
    poses: dict[int, tuple],      # kf_id -> (1, R_cw, t_cw)
    edges: list[tuple],           # (id_i, id_j, (s, R, t) = Sji measured)
    fixed_ids: set[int],
    iterations: int = 15,
) -> dict[int, tuple]:
    """Gravity-preserving essential graph for inertial maps
    (Optimizer::OptimizeEssentialGraph4DoF, src/Optimizer.cc:5292): each
    vertex moves in yaw + translation only, so the loop correction can never
    tilt the gravity direction an IMU-initialized map aligned to -z.

    Updates are RIGHT-multiplicative world-side perturbations
    x' = x o exp([rho, 0, 0, phi_z, 0])^-1 — a world-frame z-rotation +
    translation, which leaves the world z axis (gravity) invariant; the
    camera-side left perturbation of the 7-DoF variant would not."""
    ids = sorted(poses)
    index = {k: i for i, k in enumerate(ids)}
    n = len(ids)
    x = {k: poses[k] for k in ids}
    dof = 4

    def lift(d4):
        xi = np.zeros(7)
        xi[:3] = d4[:3]
        xi[5] = d4[3]    # phi_z: yaw about the world z axis
        return xi

    def apply(S, d4):
        return sim3_mul(S, sim3_inv(sim3_exp(lift(d4))))

    def edge_residual(Si, Sj, Sji):
        return sim3_log(*sim3_mul(sim3_mul(Sji, Si), sim3_inv(Sj)))

    eps = 1e-6
    for _ in range(iterations):
        H = {}
        b = np.zeros(n * dof)
        for (i_id, j_id, Sji) in edges:
            Si, Sj = x[i_id], x[j_id]
            r = edge_residual(Si, Sj, Sji)
            Ji = np.zeros((7, dof))
            Jj = np.zeros((7, dof))
            for k in range(dof):
                d = np.zeros(dof)
                d[k] = eps
                Ji[:, k] = (edge_residual(apply(Si, d), Sj, Sji) - r) / eps
                Jj[:, k] = (edge_residual(Si, apply(Sj, d), Sji) - r) / eps
            ii, jj = index[i_id], index[j_id]
            for (a, Ja) in ((ii, Ji), (jj, Jj)):
                b[a * dof:(a + 1) * dof] += Ja.T @ r
                for (c, Jc) in ((ii, Ji), (jj, Jj)):
                    key = (a, c)
                    H[key] = H.get(key, 0) + Ja.T @ Jc

        rows, cols, vals = [], [], []
        for (a, c), blk in H.items():
            for p in range(dof):
                for q in range(dof):
                    rows.append(a * dof + p)
                    cols.append(c * dof + q)
                    vals.append(blk[p, q])
        A = sp.csr_matrix((vals, (rows, cols)), shape=(n * dof, n * dof))
        A = A + sp.eye(n * dof) * 1e-6
        free = np.ones(n * dof, bool)
        for k in fixed_ids:
            if k in index:
                free[index[k] * dof:(index[k] + 1) * dof] = False
        fi = np.where(free)[0]
        if len(fi) == 0:
            break
        try:
            dx_f = spla.spsolve(A[fi][:, fi].tocsc(), -b[fi])
        except Exception:
            break
        dx = np.zeros(n * dof)
        dx[fi] = dx_f
        for k in ids:
            i = index[k]
            d = dx[i * dof:(i + 1) * dof]
            if np.abs(d).max() < 1e-12:
                continue
            x[k] = apply(x[k], d)
        if np.abs(dx).max() < 1e-8:
            break
    return x


def optimize_essential_graph(
    poses: dict[int, tuple],      # kf_id -> (s, R_cw, t_cw) Sim3 (s=1 pre-loop)
    edges: list[tuple],           # (id_i, id_j, (s, R, t) = Sji measured: j <- i)
    fixed_ids: set[int],
    fix_scale: bool = False,
    iterations: int = 15,
) -> dict[int, tuple]:
    """GN on the pose graph: edge residual r = log(Sji * Si * Sj^-1)
    (g2o EdgeSim3 with vertices storing world->camera Sim3s)."""
    ids = sorted(poses)
    index = {k: i for i, k in enumerate(ids)}
    n = len(ids)
    x = {k: poses[k] for k in ids}
    dof = 7

    def edge_residual(Si, Sj, Sji):
        return sim3_log(*sim3_mul(sim3_mul(Sji, Si), sim3_inv(Sj)))

    eps = 1e-6
    for _ in range(iterations):
        H = {}
        b = np.zeros(n * dof)
        total = 0.0
        for (i_id, j_id, Sji) in edges:
            Si, Sj = x[i_id], x[j_id]
            r = edge_residual(Si, Sj, Sji)
            total += r @ r
            # numeric Jacobians wrt left-perturbations of Si and Sj
            Ji = np.zeros((dof, dof))
            Jj = np.zeros((dof, dof))
            for k in range(dof):
                d = np.zeros(dof)
                d[k] = eps
                pert = sim3_exp(d)
                Ji[:, k] = (edge_residual(sim3_mul(pert, Si), Sj, Sji) - r) / eps
                Jj[:, k] = (edge_residual(Si, sim3_mul(pert, Sj), Sji) - r) / eps
            ii, jj = index[i_id], index[j_id]
            for (a, Ja) in ((ii, Ji), (jj, Jj)):
                b[a * dof:(a + 1) * dof] += Ja.T @ r
                for (c, Jc) in ((ii, Ji), (jj, Jj)):
                    key = (a, c)
                    H[key] = H.get(key, 0) + Ja.T @ Jc

        rows, cols, vals = [], [], []
        for (a, c), blk in H.items():
            for p in range(dof):
                for q in range(dof):
                    rows.append(a * dof + p)
                    cols.append(c * dof + q)
                    vals.append(blk[p, q])
        # gauge + options: fix vertices; optionally freeze scale everywhere
        A = sp.csr_matrix((vals, (rows, cols)), shape=(n * dof, n * dof))
        A = A + sp.eye(n * dof) * 1e-6
        free = np.ones(n * dof, bool)
        for k in fixed_ids:
            if k in index:
                free[index[k] * dof:(index[k] + 1) * dof] = False
        if fix_scale:
            for i in range(n):
                free[i * dof + 6] = False
        fi = np.where(free)[0]
        if len(fi) == 0:
            break
        Af = A[fi][:, fi]
        bf = b[fi]
        try:
            dx_f = spla.spsolve(Af.tocsc(), -bf)
        except Exception:
            break
        dx = np.zeros(n * dof)
        dx[fi] = dx_f
        # apply left-multiplicative updates
        for k in ids:
            i = index[k]
            d = dx[i * dof:(i + 1) * dof]
            if np.abs(d).max() < 1e-12:
                continue
            x[k] = sim3_mul(sim3_exp(d), x[k])
        if np.abs(dx).max() < 1e-8:
            break
    return x
