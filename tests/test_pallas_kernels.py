"""Pallas fused Hamming+penalty kernel vs the XLA reference (interpret mode
on CPU; the on-chip path is exercised by tools/tpu_golden_check.py)."""

import numpy as np
import jax.numpy as jnp

from fasttrack_tpu.ops.hamming import hamming_matrix_f32
from fasttrack_tpu.ops.pallas_kernels import hamming_penalty_matrix


class TestPallasHamming:
    def test_matches_xla_reference(self, rng):
        M, N = 256, 128
        q = jnp.asarray((2 * rng.integers(0, 2, (M, 256)) - 1).astype(np.int8))
        k = jnp.asarray((2 * rng.integers(0, 2, (N, 256)) - 1).astype(np.int8))
        qp = jnp.asarray(rng.uniform(0, 5, M).astype(np.float32))
        kp = jnp.asarray(rng.uniform(0, 5, N).astype(np.float32))
        ref = hamming_matrix_f32(q, k) + qp[:, None] + kp[None, :]
        out = hamming_penalty_matrix(q, k, qp, kp, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_identity_descriptors_zero_distance(self, rng):
        d = jnp.asarray((2 * rng.integers(0, 2, (128, 256)) - 1).astype(np.int8))
        z = jnp.zeros(128, jnp.float32)
        out = np.asarray(hamming_penalty_matrix(d, d, z, z, interpret=True))
        np.testing.assert_allclose(np.diag(out), 0.0, atol=1e-6)
        assert out.min() >= 0
