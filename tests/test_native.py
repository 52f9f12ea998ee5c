"""Tests for the native C++ host kernels vs the JAX/NumPy implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from fasttrack_tpu import native
from fasttrack_tpu.ops.descriptor import pack_bits
from fasttrack_tpu.ops.fast import fast_score
from fasttrack_tpu.ops.hamming import hamming_matrix, signed_descriptors

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library build unavailable"
)


class TestNative:
    def test_hamming_matches_device(self, rng):
        b1 = rng.integers(0, 2, size=(60, 256)).astype(np.uint8)
        b2 = rng.integers(0, 2, size=(45, 256)).astype(np.uint8)
        ref = np.asarray(
            hamming_matrix(signed_descriptors(jnp.asarray(b1)), signed_descriptors(jnp.asarray(b2)))
        )
        p1 = np.asarray(pack_bits(jnp.asarray(b1)))
        p2 = np.asarray(pack_bits(jnp.asarray(b2)))
        out = native.hamming_matrix_packed(p1, p2)
        np.testing.assert_array_equal(out, ref)

    def test_fast_score_matches_device(self, rng):
        img = rng.normal(size=(64, 96)).astype(np.float32) * 40 + 128
        ref = np.asarray(fast_score(jnp.asarray(img)[None])[0])
        out = native.fast_score(img)
        # interior only (borders are zero in native, -maxdiff in jax roll)
        np.testing.assert_allclose(out[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-4)

    def test_octree_distribution(self, rng):
        n = 500
        x = rng.uniform(0, 640, n).astype(np.float32)
        y = rng.uniform(0, 480, n).astype(np.float32)
        s = rng.uniform(0, 100, n).astype(np.float32)
        sel = native.distribute_octree(x, y, s, (0, 640, 0, 480), 100)
        assert 50 <= len(sel) <= 100
        assert len(np.unique(sel)) == len(sel)
        # spread: selected points should cover all four quadrants
        qx = (x[sel] > 320).astype(int) + 2 * (y[sel] > 240).astype(int)
        assert len(np.unique(qx)) == 4

    def test_octree_keeps_best_in_sparse_region(self):
        # two clusters; the best-scored point of each must survive
        x = np.asarray([10, 11, 12, 600, 601], np.float32)
        y = np.asarray([10, 11, 12, 400, 401], np.float32)
        s = np.asarray([1, 9, 2, 3, 8], np.float32)
        sel = native.distribute_octree(x, y, s, (0, 640, 0, 480), 2)
        assert set(sel) == {1, 4}
