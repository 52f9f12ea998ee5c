"""Image pyramid: bilinear resize + 7x7 Gaussian blur, padded level tensor.

Parity targets: src/resize.cu:19-57 (bilinear pyramid, all levels in one 3-D
launch over a level-0-pitch buffer) and src/gaussian_blur.cu:17-54 (7x7
conv per level; KW=KH=7, SIGMA=2 — include/ORBextractor.h:33-35).

TPU-first design: levels live in ONE padded tensor (L, H0, W0) exactly like
the reference's `level*cols*rows` device layout (fast.cu:270), so FAST /
orientation / descriptor run as single fused ops across all levels. The blur
is a separable depthwise conv with L as the batch dim — XLA fuses pad + two
1-D convs into a couple of HBM passes.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PyramidConfig(NamedTuple):
    height: int
    width: int
    n_levels: int = 8
    scale_factor: float = 1.2

    @property
    def scales(self):
        return [self.scale_factor**l for l in range(self.n_levels)]

    @property
    def inv_scales(self):
        return [1.0 / s for s in self.scales]

    @property
    def level_sizes(self):
        """(h_l, w_l) per level, rounding like cv::resize."""
        return [
            (int(round(self.height / s)), int(round(self.width / s)))
            for s in self.scales
        ]

    def sigma2(self):
        """Per-level keypoint variance (ORBextractor mvLevelSigma2)."""
        return np.asarray(
            [self.scale_factor ** (2 * l) for l in range(self.n_levels)],
            dtype=np.float32,
        )


def gaussian_kernel_1d(size: int = 7, sigma: float = 2.0) -> np.ndarray:
    r = np.arange(size) - (size - 1) / 2
    k = np.exp(-0.5 * (r / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_levels(levels: jnp.ndarray, size: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur on (L, H, W) with replicate edge padding
    (the reference kernel clamps coordinates at borders,
    gaussian_blur.cu:17-54)."""
    k = jnp.asarray(gaussian_kernel_1d(size, sigma))
    pad = size // 2
    x = levels[:, None, :, :]  # NCHW, C=1
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    kv = k.reshape(1, 1, size, 1)
    kh = k.reshape(1, 1, 1, size)
    dn = jax.lax.conv_dimension_numbers(x.shape, kv.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID", dimension_numbers=dn)
    return x[:, 0]


class Pyramid(NamedTuple):
    """Padded pyramid tensors. Levels beyond (h_l, w_l) are zero."""

    raw: jnp.ndarray      # (L, H0, W0) float32, unblurred (FAST reads this)
    blurred: jnp.ndarray  # (L, H0, W0) float32 (descriptor reads this)
    # Static (python) metadata:
    config: PyramidConfig


@functools.partial(jax.jit, static_argnames=("config",))
def build_pyramid(image: jnp.ndarray, config: PyramidConfig) -> Pyramid:
    """image (H, W) uint8/float -> Pyramid.

    Each level is resized from level 0 directly (better than chained
    downsampling; the reference chains from the previous level which
    compounds bilinear softening).
    """
    img = image.astype(jnp.float32)
    L = config.n_levels
    H0, W0 = config.height, config.width
    levels = jnp.zeros((L, H0, W0), dtype=jnp.float32)
    levels = levels.at[0].set(img)
    for l in range(1, L):
        h, w = config.level_sizes[l]
        small = jax.image.resize(img, (h, w), method="bilinear")
        levels = levels.at[l, :h, :w].set(small)
    blurred = _blur_levels(levels)
    # Zero the padding of the blurred tensor so kernels see clean borders.
    mask = level_valid_mask(config)
    blurred = blurred * mask
    return Pyramid(levels, blurred, config)


@functools.lru_cache(maxsize=8)
def _valid_mask_np(config: PyramidConfig) -> np.ndarray:
    m = np.zeros((config.n_levels, config.height, config.width), dtype=np.float32)
    for l, (h, w) in enumerate(config.level_sizes):
        m[l, :h, :w] = 1.0
    return m


def level_valid_mask(config: PyramidConfig) -> jnp.ndarray:
    return jnp.asarray(_valid_mask_np(config))
