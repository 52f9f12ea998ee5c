"""Robust kernels for IRLS (g2o RobustKernelHuber semantics)."""

from __future__ import annotations

import jax.numpy as jnp

# chi2 thresholds at 95%: 2-dof (mono) and 3-dof (stereo) — Optimizer.cc:858,900
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel on squared error chi2 = r^T O r.

    w = 1 inside the quadratic region, delta / |r| outside — equivalent to
    g2o's rho'(chi2) weighting with delta^2 = chi2 threshold."""
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))
