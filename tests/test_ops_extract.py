"""Tests for pyramid / FAST / orientation / descriptor / hamming ops."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.signal import convolve2d
from scipy.ndimage import rotate as nd_rotate

from fasttrack_tpu.ops import (
    OrbConfig,
    build_pyramid,
    extract_orb,
    hamming_matrix,
    hamming_matrix_packed,
    signed_descriptors,
)
from fasttrack_tpu.ops.descriptor import pack_bits, unpack_bits
from fasttrack_tpu.ops.fast import CIRCLE, FastConfig, fast_detect, fast_score
from fasttrack_tpu.ops.orientation import ic_angles
from fasttrack_tpu.ops.pyramid import PyramidConfig, gaussian_kernel_1d


def np_bilinear_resize(img, h_out, w_out):
    """Plain 2-tap bilinear with half-pixel centers (cv::resize semantics)."""
    h_in, w_in = img.shape

    def coords(n_out, n_in):
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        src = np.clip(src, 0.0, n_in - 1.0)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        f = src - lo
        return lo, hi, f

    ylo, yhi, fy = coords(h_out, h_in)
    xlo, xhi, fx = coords(w_out, w_in)
    rows = img[ylo] * (1 - fy)[:, None] + img[yhi] * fy[:, None]
    return rows[:, xlo] * (1 - fx)[None, :] + rows[:, xhi] * fx[None, :]


def textured_image(rng, h=240, w=320, block=8):
    """Random block texture — plenty of corners for FAST."""
    small = rng.integers(0, 256, size=(h // block, w // block))
    img = np.kron(small, np.ones((block, block))).astype(np.float32)
    return img


class TestPyramid:
    def test_blur_matches_scipy(self, rng):
        img = rng.normal(size=(64, 96)).astype(np.float32) * 50 + 128
        cfg = PyramidConfig(64, 96, n_levels=1)
        pyr = build_pyramid(jnp.asarray(img), cfg)
        k1 = gaussian_kernel_1d(7, 2.0)
        k2 = np.outer(k1, k1)
        ref = convolve2d(np.pad(img, 3, mode="edge"), k2, mode="valid")
        np.testing.assert_allclose(np.asarray(pyr.blurred[0]), ref, atol=1e-2)

    def test_level_sizes_and_content(self, rng):
        img = textured_image(rng)
        cfg = PyramidConfig(240, 320, n_levels=4, scale_factor=1.2)
        pyr = build_pyramid(jnp.asarray(img), cfg)
        assert pyr.raw.shape == (4, 240, 320)
        (h1, w1) = cfg.level_sizes[1]
        assert (h1, w1) == (200, 267)
        # level 1 content matches plain 2-tap bilinear (cv::resize
        # INTER_LINEAR semantics — the reference's resize.cu; NOT
        # jax.image.resize, which antialiases on downscale)
        ref = np_bilinear_resize(img, h1, w1)
        np.testing.assert_allclose(np.asarray(pyr.raw[1, :h1, :w1]), ref, atol=1e-2)
        # padding is zero
        assert float(jnp.abs(pyr.raw[1, h1:, :]).max()) == 0.0


def np_fast_is_corner(img, y, x, t=20.0, n=9):
    """NumPy oracle for the FAST-9 segment test."""
    c = img[y, x]
    vals = np.array([img[y + dy, x + dx] for (dx, dy) in CIRCLE])
    bright = vals > c + t
    dark = vals < c - t
    for mask in (bright, dark):
        ext = np.concatenate([mask, mask])
        run = 0
        for v in ext:
            run = run + 1 if v else 0
            if run >= n:
                return True
    return False


class TestFast:
    def test_uniform_image_no_corners(self):
        img = jnp.full((1, 64, 64), 128.0)
        kp = fast_detect(img, ((64, 64),), (100,))
        assert int(kp.valid.sum()) == 0

    def test_detects_isolated_dots(self, rng):
        # dots must sit inside the 21-px descriptor-patch border
        img = np.full((64, 64), 100.0, np.float32)
        dots = [(25, 25), (30, 38), (38, 28)]
        for (y, x) in dots:
            img[y, x] = 255.0
        kp = fast_detect(jnp.asarray(img)[None], ((64, 64),), (100,))
        found = {
            (int(y), int(x))
            for y, x, v in zip(np.asarray(kp.y[0]), np.asarray(kp.x[0]), np.asarray(kp.valid[0]))
            if v
        }
        for d in dots:
            assert d in found, f"dot {d} not detected, found {found}"

    def test_detected_pixels_pass_oracle(self, rng):
        img = textured_image(rng, 128, 128)
        kp = fast_detect(jnp.asarray(img)[None], ((128, 128),), (200,))
        ys, xs, vs = np.asarray(kp.y[0]), np.asarray(kp.x[0]), np.asarray(kp.valid[0])
        scores = np.asarray(kp.score[0])
        checked = 0
        for y, x, v, s in zip(ys, xs, vs, scores):
            if not v:
                continue
            # Score is the max threshold at which the oracle still fires.
            assert np_fast_is_corner(img, y, x, t=min(s - 1e-3, 100.0)), (y, x, s)
            checked += 1
        assert checked > 20

    def test_score_matches_oracle_threshold(self, rng):
        img = textured_image(rng, 96, 96)
        sc = np.asarray(fast_score(jnp.asarray(img)[None])[0])
        ys, xs = np.where(sc > 25)
        inb = (ys > 4) & (ys < 92) & (xs > 4) & (xs < 92)
        count = 0
        for y, x in list(zip(ys[inb], xs[inb]))[:50]:
            s = sc[y, x]
            assert np_fast_is_corner(img, y, x, t=s - 1.0)
            assert not np_fast_is_corner(img, y, x, t=s + 1.0)
            count += 1
        assert count > 10

    def test_low_threshold_retry(self):
        # Weak corner (contrast 10, between minTh=7 and iniTh=20) alone in its
        # cell must still be detected via the per-cell low-threshold retry.
        img = np.full((64, 64), 100.0, np.float32)
        img[32, 32] = 112.0
        kp = fast_detect(jnp.asarray(img)[None], ((64, 64),), (10,))
        found = {
            (int(y), int(x))
            for y, x, v in zip(np.asarray(kp.y[0]), np.asarray(kp.x[0]), np.asarray(kp.valid[0]))
            if v
        }
        assert (32, 32) in found


class TestOrientation:
    def test_gradient_angle(self):
        # Intensity increasing with +x -> centroid along +x -> angle ~ 0.
        img = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        a = float(ic_angles(jnp.asarray(img)[None], jnp.asarray([32]), jnp.asarray([32]), jnp.asarray([0]))[0])
        assert abs(a) < 0.05
        # +y gradient -> angle ~ pi/2.
        a2 = float(
            ic_angles(jnp.asarray(img.T)[None], jnp.asarray([32]), jnp.asarray([32]), jnp.asarray([0]))[0]
        )
        assert abs(a2 - np.pi / 2) < 0.05

    def test_rotation_covariance(self, rng):
        img = np.zeros((101, 101), np.float32)
        img[30:45, 55:70] = 200.0  # off-center blob
        img90 = nd_rotate(img, 90, reshape=False, order=1)
        a0 = float(ic_angles(jnp.asarray(img)[None], jnp.asarray([50]), jnp.asarray([50]), jnp.asarray([0]))[0])
        a90 = float(
            ic_angles(jnp.asarray(img90)[None], jnp.asarray([50]), jnp.asarray([50]), jnp.asarray([0]))[0]
        )
        diff = (a90 - a0 + np.pi) % (2 * np.pi) - np.pi
        assert abs(abs(diff) - np.pi / 2) < 0.1


class TestDescriptorAndHamming:
    def test_pack_unpack_roundtrip(self, rng):
        bits = jnp.asarray(rng.integers(0, 2, size=(16, 256)).astype(np.uint8))
        np.testing.assert_array_equal(np.asarray(unpack_bits(pack_bits(bits))), np.asarray(bits))

    def test_hamming_matmul_vs_popcount(self, rng):
        b1 = rng.integers(0, 2, size=(64, 256)).astype(np.uint8)
        b2 = rng.integers(0, 2, size=(48, 256)).astype(np.uint8)
        s1 = signed_descriptors(jnp.asarray(b1))
        s2 = signed_descriptors(jnp.asarray(b2))
        hm = np.asarray(hamming_matrix(s1, s2))
        p1 = np.asarray(pack_bits(jnp.asarray(b1)))
        p2 = np.asarray(pack_bits(jnp.asarray(b2)))
        ref = hamming_matrix_packed(p1, p2)
        np.testing.assert_array_equal(hm, ref)
        # sanity: identical descriptors -> distance 0
        assert hm.min() >= 0 and np.asarray(hamming_matrix(s1, s1)).diagonal().max() == 0


class TestExtractOrb:
    CFG = OrbConfig(height=240, width=320, n_features=256, n_levels=4)

    def test_end_to_end(self, rng):
        img = textured_image(rng)
        kps, pyr = extract_orb(jnp.asarray(img), self.CFG)
        n_valid = int(kps.valid.sum())
        assert n_valid > 100
        v = np.asarray(kps.valid)
        xs, ys = np.asarray(kps.x)[v], np.asarray(kps.y)[v]
        assert xs.min() >= 0 and xs.max() < 320
        assert ys.min() >= 0 and ys.max() < 240
        # descriptors of valid keypoints are not all identical
        packed = np.asarray(kps.desc_packed)[v]
        assert len(np.unique(packed, axis=0)) > n_valid * 0.8

    def test_determinism(self, rng):
        img = jnp.asarray(textured_image(rng))
        k1, _ = extract_orb(img, self.CFG)
        k2, _ = extract_orb(img, self.CFG)
        np.testing.assert_array_equal(np.asarray(k1.desc_packed), np.asarray(k2.desc_packed))
        np.testing.assert_array_equal(np.asarray(k1.x), np.asarray(k2.x))

    def test_descriptor_rotation_robustness(self, rng):
        # A distinctive blob pattern; rotate image 15 deg, re-extract, check
        # the strongest keypoints still match under Hamming.
        img = textured_image(rng, 240, 320, block=16)
        img_r = nd_rotate(img, 15, reshape=False, order=1, mode="nearest")
        k1, _ = extract_orb(jnp.asarray(img), self.CFG)
        k2, _ = extract_orb(jnp.asarray(img_r), self.CFG)
        hm = np.asarray(hamming_matrix(k1.desc_signed, k2.desc_signed))
        v1, v2 = np.asarray(k1.valid), np.asarray(k2.valid)
        hm = hm[v1][:, v2]
        # for most valid kps in image 1, the best match in image 2 is decent
        best = hm.min(axis=1)
        assert np.median(best) < 80  # random pairs would be ~128
