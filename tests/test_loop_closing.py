"""Tests for Sim3 solving, essential-graph optimization, and loop closing."""

import numpy as np
from scipy.spatial.transform import Rotation

from fasttrack_tpu.optim.pose_graph import (
    optimize_essential_graph,
    sim3_exp,
    sim3_inv,
    sim3_log,
    sim3_mul,
)
from fasttrack_tpu.optim.sim3_solver import solve_sim3


class TestSim3Solver:
    def make_case(self, rng, n=80, s=1.3, outliers=10):
        K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
        X2 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)], -1
        )
        R = Rotation.from_rotvec([0.05, -0.1, 0.2]).as_matrix()
        t = np.array([0.4, -0.2, 0.1])
        X1 = s * (X2 @ R.T) + t

        def proj(X):
            return np.stack(
                [400 * X[:, 0] / X[:, 2] + 320, 400 * X[:, 1] / X[:, 2] + 240], -1
            )

        uv1 = proj(X1) + rng.normal(size=(n, 2)) * 0.3
        uv2 = proj(X2) + rng.normal(size=(n, 2)) * 0.3
        X2n = X2 + rng.normal(size=X2.shape) * 0.01
        X1n = X1 + rng.normal(size=X1.shape) * 0.01
        if outliers:
            idx = rng.choice(n, outliers, replace=False)
            X2n[idx] += rng.uniform(0.5, 2.0, size=(outliers, 3))
        return X1n, X2n, uv1, uv2, K, R, t, s

    def test_recovers_sim3(self, rng):
        X1, X2, uv1, uv2, K, R, t, s = self.make_case(rng)
        res = solve_sim3(X1, X2, uv1, uv2, K, K, np.ones(len(X1)), np.ones(len(X1)))
        assert res.success
        assert abs(res.s - s) < 0.05
        ang = np.rad2deg(np.arccos(np.clip((np.trace(res.R.T @ R) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(res.t - t) < 0.1

    def test_fix_scale(self, rng):
        X1, X2, uv1, uv2, K, R, t, s = self.make_case(rng, s=1.0, outliers=5)
        res = solve_sim3(
            X1, X2, uv1, uv2, K, K, np.ones(len(X1)), np.ones(len(X1)), fix_scale=True
        )
        assert res.success and res.s == 1.0

    def test_fails_on_garbage(self, rng):
        n = 40
        X1 = rng.uniform(-5, 5, size=(n, 3)) + [0, 0, 6]
        X2 = rng.uniform(-5, 5, size=(n, 3)) + [0, 0, 6]
        uv = rng.uniform(0, 640, size=(n, 2))
        K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
        res = solve_sim3(X1, X2, uv, uv, K, K, np.ones(n), np.ones(n))
        assert not res.success


class TestPoseGraphSim3Ops:
    def test_exp_log_roundtrip(self, rng):
        for _ in range(20):
            xi = rng.normal(size=7) * 0.5
            s, R, t = sim3_exp(xi)
            np.testing.assert_allclose(sim3_log(s, R, t), xi, atol=1e-8)

    def test_mul_inv(self, rng):
        a = sim3_exp(rng.normal(size=7) * 0.5)
        prod = sim3_mul(a, sim3_inv(a))
        np.testing.assert_allclose(prod[0], 1.0, atol=1e-10)
        np.testing.assert_allclose(prod[1], np.eye(3), atol=1e-10)
        np.testing.assert_allclose(prod[2], 0.0, atol=1e-10)


class TestEssentialGraph:
    def test_loop_correction_distributes_drift(self, rng):
        """Chain 0-1-...-9 with odometry edges + a loop edge 9->0 measured
        with the TRUE relative pose; initial poses have accumulated drift.
        After optimization the loop must close (relative pose residuals small)."""
        n = 10
        true_poses = []
        for k in range(n):
            xi = np.zeros(7)
            xi[0] = 0.5 * k  # straight line in x (rho)
            true_poses.append(sim3_exp(xi))
        # odometry measurements (true, noiseless)
        edges = []
        for k in range(n - 1):
            Sji = sim3_mul(true_poses[k + 1], sim3_inv(true_poses[k]))
            edges.append((k, k + 1, Sji))
        # loop edge 9 -> 0 true relative
        S09 = sim3_mul(true_poses[0], sim3_inv(true_poses[9]))
        edges.append((9, 0, S09))
        # drifted initialization: growing error
        init = {}
        for k in range(n):
            d = np.zeros(7)
            d[1] = 0.05 * k     # y drift
            d[4] = 0.01 * k     # rotation drift
            init[k] = sim3_mul(sim3_exp(d), true_poses[k])
        init[0] = true_poses[0]
        out = optimize_essential_graph(init, edges, fixed_ids={0}, fix_scale=True)
        # all relative edge residuals should be tiny
        for (i, j, Sji) in edges:
            r = sim3_log(*sim3_mul(sim3_mul(Sji, out[i]), sim3_inv(out[j])))
            assert np.abs(r).max() < 1e-2, (i, j, r)
        # fixed vertex untouched
        np.testing.assert_allclose(out[0][2], true_poses[0][2], atol=1e-12)

    def test_scale_drift_correction(self, rng):
        """Monocular-style: initialization has scale drift; the Sim3 graph
        with a loop edge should absorb it when fix_scale=False."""
        n = 8
        true_poses = [sim3_exp(np.array([0.4 * k, 0, 0, 0, 0, 0, 0.0])) for k in range(n)]
        edges = []
        for k in range(n - 1):
            edges.append((k, k + 1, sim3_mul(true_poses[k + 1], sim3_inv(true_poses[k]))))
        edges.append((n - 1, 0, sim3_mul(true_poses[0], sim3_inv(true_poses[n - 1]))))
        init = {}
        for k in range(n):
            d = np.zeros(7)
            d[6] = 0.03 * k  # growing scale drift
            init[k] = sim3_mul(sim3_exp(d), true_poses[k])
        init[0] = true_poses[0]
        out = optimize_essential_graph(init, edges, fixed_ids={0}, fix_scale=False)
        for (i, j, Sji) in edges:
            r = sim3_log(*sim3_mul(sim3_mul(Sji, out[i]), sim3_inv(out[j])))
            assert np.abs(r).max() < 1e-2, (i, j, r)


class TestAnalyticEdgeJacobians:
    """The batched analytic Jacobians (pose_graph module docstring) must
    match finite differences of the edge residual to first order — this is
    what replaced the per-edge numeric loops (Optimizer.cc:1501 parity at
    >=40x the speed)."""

    def _edge_residual(self, Si, Sj, Sji):
        return sim3_log(*sim3_mul(sim3_mul(Sji, Si), sim3_inv(Sj)))

    def test_matches_finite_differences(self, rng):
        from fasttrack_tpu.optim.pose_graph import _bad, _badj, sim3_exp

        for _ in range(10):
            Si = sim3_exp(rng.normal(size=7) * 0.4)
            Sj = sim3_exp(rng.normal(size=7) * 0.4)
            # measurement near-consistent: small residual regime
            Sji = sim3_mul(sim3_mul(Sj, sim3_exp(rng.normal(size=7) * 0.02)),
                           sim3_inv(Si))
            r = self._edge_residual(Si, Sj, Sji)
            ad_r = _bad(r[None])[0]
            adj_m = _badj(np.array([Sji[0]]), np.asarray(Sji[1])[None],
                          np.asarray(Sji[2])[None])[0]
            Ji = (np.eye(7) - 0.5 * ad_r) @ adj_m
            Jj = -(np.eye(7) + 0.5 * ad_r)
            eps = 1e-6
            for k in range(7):
                d = np.zeros(7)
                d[k] = eps
                pert = sim3_exp(d)
                gi = (self._edge_residual(sim3_mul(pert, Si), Sj, Sji) - r) / eps
                gj = (self._edge_residual(Si, sim3_mul(pert, Sj), Sji) - r) / eps
                np.testing.assert_allclose(Ji[:, k], gi, atol=5e-3)
                np.testing.assert_allclose(Jj[:, k], gj, atol=5e-3)

    def test_adjoint_identity(self, rng):
        """Adj(S) satisfies S exp(xi) S^-1 = exp(Adj(S) xi)."""
        from fasttrack_tpu.optim.pose_graph import _badj, sim3_exp

        for _ in range(10):
            S = sim3_exp(rng.normal(size=7) * 0.5)
            xi = rng.normal(size=7) * 0.1
            adj = _badj(np.array([S[0]]), np.asarray(S[1])[None],
                        np.asarray(S[2])[None])[0]
            lhs = sim3_mul(sim3_mul(S, sim3_exp(xi)), sim3_inv(S))
            rhs = sim3_exp(adj @ xi)
            np.testing.assert_allclose(lhs[0], rhs[0], atol=1e-8)
            np.testing.assert_allclose(lhs[1], rhs[1], atol=1e-7)
            np.testing.assert_allclose(lhs[2], rhs[2], atol=1e-7)

    def test_large_graph_converges_fast(self, rng):
        """500-KF drifted ring with ~3000 edges: the batched GN must reach
        the same (near-zero) optimum in well under the old numeric-loop
        budget (this ran 35 s before, <2 s now; assert a loose 10 s guard
        so slow CI can't flake)."""
        import time

        from fasttrack_tpu.optim.pose_graph import optimize_essential_graph

        n_kf = 500
        true = {}
        for i in range(n_kf):
            th = 2 * np.pi * i / n_kf
            R = Rotation.from_euler("y", th).as_matrix()
            c = np.array([10 * np.cos(th), 0.0, 10 * np.sin(th)])
            true[i] = (1.0, R, -R @ c)
        poses = {0: true[0]}
        for i in range(1, n_kf):
            rel = sim3_mul(true[i], sim3_inv(true[i - 1]))
            noise = sim3_exp(np.concatenate([
                rng.normal(0, 0.01, 3), rng.normal(0, 0.003, 3),
                [rng.normal(0, 0.002)],
            ]))
            poses[i] = sim3_mul(sim3_mul(rel, noise), poses[i - 1])
        edges = []
        for i in range(n_kf):
            for d in (1, 2, 3, 5):
                if i + d < n_kf:
                    edges.append((i, i + d,
                                  sim3_mul(true[i + d], sim3_inv(true[i]))))
        edges.append((0, n_kf - 1, sim3_mul(true[n_kf - 1], sim3_inv(true[0]))))
        t0 = time.perf_counter()
        out = optimize_essential_graph(poses, edges, {0}, iterations=15)
        dt = time.perf_counter() - t0
        cost = 0.0
        for (i, j, m) in edges:
            r = sim3_log(*sim3_mul(sim3_mul(m, out[i]), sim3_inv(out[j])))
            cost += r @ r
        assert cost < 1e-6, cost
        assert dt < 10.0, dt
