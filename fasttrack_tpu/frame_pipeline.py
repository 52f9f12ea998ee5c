"""The jitted per-frame front-end: images -> device-resident FrameData.

Parity target: the Frame constructor hot path (Frame.cc:115-170): parallel
L/R ORB extraction (two std::threads, Frame.cc:127-130) + GPU stereo matching
(ComputeStereoMatchesGPU, Frame.cc:1007-1063) + grid assignment.

TPU-first design: the two cameras are one batched extraction (vmap over a
(2, H, W) tensor — the TPU's answer to the reference's two threads + three
CUDA streams), stereo matching fuses into the same jit program, and the
whole FrameData stays device-resident for the subsequent search/pose kernels
(the reference's persistent GPU residency, KernelController.cu:100-117).
The 64x48 feature grid of the reference exists only to accelerate windowed
search on a GPU; the MXU matmul matcher needs no grid, so none is built.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fasttrack_tpu.ops.extractor import Keypoints, OrbConfig, extract_orb
from fasttrack_tpu.ops.stereo_match import StereoMatches, match_rectified


class FrameData(NamedTuple):
    """Device-resident arrays for one stereo (or mono) frame."""

    kps: Keypoints          # left-camera keypoints
    kps_right: Keypoints | None
    u_right: jnp.ndarray    # (N,) float32; -1 = no stereo depth
    depth: jnp.ndarray      # (N,) float32; -1 = none
    n_valid: jnp.ndarray    # () int32


@functools.partial(jax.jit, static_argnames=("config",))
def process_mono_frame(image: jnp.ndarray, config: OrbConfig) -> FrameData:
    kps, _ = extract_orb(image, config)
    n = kps.capacity
    neg = jnp.full((n,), -1.0)
    return FrameData(kps, None, neg, neg, jnp.sum(kps.valid.astype(jnp.int32)))


@functools.partial(jax.jit, static_argnames=("config",))
def process_stereo_frame(
    image_left: jnp.ndarray,
    image_right: jnp.ndarray,
    config: OrbConfig,
    bf: jnp.ndarray,
    min_z: jnp.ndarray,
) -> FrameData:
    """Rectified stereo frame: batched L/R extraction + stereo depth."""
    images = jnp.stack([image_left, image_right])
    kps2, pyr2 = jax.vmap(lambda im: extract_orb(im, config))(images)
    kl = jax.tree_util.tree_map(lambda a: a[0], kps2)
    kr = jax.tree_util.tree_map(lambda a: a[1], kps2)
    scale_factors = jnp.asarray(
        [config.scale_factor**l for l in range(config.n_levels)], dtype=jnp.float32
    )
    sm: StereoMatches = match_rectified(
        jnp.stack([kl.x, kl.y], -1), kl.level, kl.desc_signed, kl.valid,
        jnp.stack([kr.x, kr.y], -1), kr.level, kr.desc_signed, kr.valid,
        pyr2.raw[0], pyr2.raw[1], kl.xl, kl.yl, scale_factors, bf, min_z,
    )
    return FrameData(
        kl, kr, sm.u_right, sm.depth, jnp.sum(kl.valid.astype(jnp.int32))
    )
