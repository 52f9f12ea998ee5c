"""BRIEF sampling pattern: 256 point pairs in a 31x31 patch.

The reference uses OpenCV's learned `bit_pattern_31_` table
(ORBextractor.cc). We generate our own deterministic pattern instead
(BRIEF-style isotropic Gaussian sampling, Calonder et al.: sigma = S/5),
seeded so every build of this framework produces identical descriptors.
Descriptors are therefore *self-consistent* (matching, BoW vocabulary and
serialized maps all use this pattern) but not bit-compatible with OpenCV
ORB — nothing in the pipeline requires that.
"""

from __future__ import annotations

import numpy as np

N_BITS = 256
PATCH_HALF = 13  # keep rotated samples within the 31x31 patch (13*sqrt(2)<19)


def _generate(seed: int = 20240917) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_HALF + 1) / 5.0
    pts = np.clip(
        np.round(rng.normal(0.0, sigma, size=(N_BITS, 2, 2))),
        -PATCH_HALF,
        PATCH_HALF,
    ).astype(np.int32)
    # Reject degenerate pairs (identical points) by nudging the second point.
    same = (pts[:, 0] == pts[:, 1]).all(axis=-1)
    pts[same, 1, 0] = np.clip(pts[same, 1, 0] + 1, -PATCH_HALF, PATCH_HALF)
    pts[same & (pts[:, 0, 0] == PATCH_HALF), 1, 0] -= 2
    return pts  # (256, 2, 2) [bit, point(a,b), (x, y)]


PATTERN = _generate()
