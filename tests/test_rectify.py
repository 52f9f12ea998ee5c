"""Stereo rectification map correctness (Settings::precomputeRectificationMaps
parity, src/Settings.cc + System.cc:273-284)."""

import numpy as np

from fasttrack_tpu.cameras.models import make_pinhole
from fasttrack_tpu.cameras.rectify import (
    _distort_pinhole,
    compute_rectification,
    remap_bilinear,
)


def make_rig():
    W, H = 320, 240
    cam1 = make_pinhole(180.0, 178.0, 162.0, 118.0, W, H)
    cam2 = make_pinhole(181.5, 179.0, 158.0, 122.0, W, H)
    D1 = np.array([-0.28, 0.07, 1e-4, -2e-4])
    D2 = np.array([-0.27, 0.065, -5e-5, 1e-4])
    # camera1 <- camera2: ~10 cm baseline with a small relative rotation
    th = 0.01
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    T_c1_c2 = np.eye(4)
    T_c1_c2[:3, :3] = Rz
    T_c1_c2[:3, 3] = [0.1, 0.002, -0.001]
    return cam1, D1, cam2, D2, T_c1_c2, W, H


class TestRectification:
    def test_map_points_to_distorted_pixels(self):
        """For a 3D point: its rectified projection, pushed through the remap
        table, must land on its distorted-image projection."""
        cam1, D1, cam2, D2, T, W, H = make_rig()
        maps = compute_rectification(cam1, D1, cam2, D2, T, W, H)
        Kn = np.asarray(maps.camera.K(), np.float64)
        K1 = np.asarray(cam1.K(), np.float64)

        # recover R1 (rectified <- cam1) from the map itself is circular;
        # instead check consistency: pick rectified pixels, look up their
        # distorted source, undistort numerically, and verify the two rays
        # differ by a single global rotation (the rectifying rotation).
        rng = np.random.default_rng(0)
        us = rng.integers(40, W - 40, 30).astype(np.float64)
        vs = rng.integers(40, H - 40, 30).astype(np.float64)
        rays_rect = np.stack(
            [(us - Kn[0, 2]) / Kn[0, 0], (vs - Kn[1, 2]) / Kn[1, 1], np.ones(30)], -1
        )
        # distorted source pixel via the map (bilinear lookup)
        ui = us.astype(int)
        vi = vs.astype(int)
        mx = maps.map_lx[vi, ui].astype(np.float64)
        my = maps.map_ly[vi, ui].astype(np.float64)
        # numerically undistort: invert the plumb-bob model by iteration
        xd = (mx - K1[0, 2]) / K1[0, 0]
        yd = (my - K1[1, 2]) / K1[1, 1]
        x, y = xd.copy(), yd.copy()
        for _ in range(30):
            xd_t, yd_t = _distort_pinhole(D1, x, y)
            x += xd - xd_t
            y += yd - yd_t
        rays_cam = np.stack([x, y, np.ones(30)], -1)

        a = rays_rect / np.linalg.norm(rays_rect, axis=1, keepdims=True)
        b = rays_cam / np.linalg.norm(rays_cam, axis=1, keepdims=True)
        # solve the best rotation a ~ R b (Kabsch) and check residuals tiny
        Hm = b.T @ a
        U, _, Vt = np.linalg.svd(Hm)
        S = np.diag([1, 1, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ S @ U.T
        err = np.linalg.norm(a - b @ R.T, axis=1)
        assert err.max() < 2e-3, err.max()

    def test_epipolar_rows_align(self):
        """A world point projected into BOTH rectified views must share its
        v coordinate (the whole point of rectification)."""
        cam1, D1, cam2, D2, T, W, H = make_rig()
        maps = compute_rectification(cam1, D1, cam2, D2, T, W, H)
        Kn = np.asarray(maps.camera.K(), np.float64)
        rng = np.random.default_rng(1)
        # world points in front of the rig (camera1 frame)
        X1 = np.stack([rng.uniform(-0.5, 0.5, 50), rng.uniform(-0.4, 0.4, 50),
                       rng.uniform(2.0, 6.0, 50)], -1)
        T_c2_c1 = np.linalg.inv(T)
        X2 = X1 @ T_c2_c1[:3, :3].T + T_c2_c1[:3, 3]

        # find each point's rectified pixel by projecting its distorted pixel
        # through the inverse map: instead project through (R_i, Kn) directly
        # by reconstructing R_i with the same Bouguet steps
        from fasttrack_tpu.cameras.rectify import _log_so3, _rodrigues

        R = T_c2_c1[:3, :3]
        t = T_c2_c1[:3, 3]
        om = _log_so3(R)
        r_l = _rodrigues(-om / 2)
        r_r = _rodrigues(om / 2).T
        t_rect = r_r @ t
        e1 = t_rect / np.linalg.norm(t_rect)
        e2 = np.array([-e1[1], e1[0], 0.0])
        e2 /= np.linalg.norm(e2)
        e3 = np.cross(e1, e2)
        if e1[0] < 0:
            e1, e2 = -e1, -e2
        R_rect = np.stack([e1, e2, e3])
        R1 = R_rect @ r_l
        R2 = R_rect @ r_r

        def proj(Ri, X):
            Xr = X @ Ri.T
            return (Kn[:2, :2] @ (Xr[:, :2] / Xr[:, 2:]).T).T + Kn[:2, 2]

        uv1 = proj(R1, X1)
        uv2 = proj(R2, X2)
        dv = np.abs(uv1[:, 1] - uv2[:, 1])
        assert dv.max() < 0.5, dv.max()
        # disparity positive (left u > right u)
        assert np.all(uv1[:, 0] - uv2[:, 0] > 0)

    def test_remap_identity_when_undistorted(self):
        """Zero distortion + identity extrinsic rotation: the remap is (close
        to) a pure reprojection; remapping a constant image stays constant."""
        W, H = 320, 240
        cam = make_pinhole(180.0, 180.0, 160.0, 120.0, W, H)
        T = np.eye(4)
        T[:3, 3] = [0.1, 0, 0]
        maps = compute_rectification(cam, np.zeros(4), cam, np.zeros(4), T, W, H)
        img = np.full((H, W), 77, np.uint8)
        out = remap_bilinear(img, maps.map_lx, maps.map_ly)
        interior = out[10:-10, 10:-10]
        assert (interior == 77).mean() > 0.99


class TestRemapDtypes:
    def test_no_255_clamp_for_depth(self):
        """uint16 mm depth and float depth must pass through remap without the
        uint8 [0,255] clamp (regression: System._resize_input corrupted far
        geometry on RGBD depth maps)."""
        h, w = 32, 32
        my, mx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        depth16 = np.full((h, w), 5000, np.uint16)  # 5 m in mm
        out16 = remap_bilinear(depth16, mx, my)
        assert out16.dtype == np.uint16
        assert out16[:-1, :-1].max() == 5000
        depthf = np.full((h, w), 7.25, np.float32) * 100.0
        outf = remap_bilinear(depthf, mx, my)
        assert outf.dtype == np.float32
        np.testing.assert_allclose(outf[:-1, :-1], 725.0, rtol=1e-5)

    def test_uint8_still_clamped(self):
        h, w = 8, 8
        my, mx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        img = np.full((h, w), 250, np.uint8)
        out = remap_bilinear(img, mx, my)
        assert out.dtype == np.uint8
