"""Benchmark: per-frame tracking hot path on the default JAX backend (TPU).

Measures the full per-frame compute pipeline the reference times as
"tracking ms/frame" (BASELINE.md): host->device image upload, stereo ORB
extraction (pyramid/FAST/orientation/BRIEF), rectified stereo matching,
search-by-projection against a local map, and motion-only pose optimization.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference's best published number
(all-GPU, PO off: 6.83 ms/frame on EuRoC MH01, grouped_plot.ipynb).
"""

import json
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from fasttrack_tpu.cameras import make_pinhole
from fasttrack_tpu.frame_pipeline import process_stereo_frame
from fasttrack_tpu.geometry import se3_identity
from fasttrack_tpu.ops import OrbConfig
from fasttrack_tpu.ops.project_match import search_by_projection
from fasttrack_tpu.optim import pose_optimize

REFERENCE_MS = 6.83  # MH01, all-GPU, PO off (BASELINE.md)

H, W = 480, 752
CFG = OrbConfig(height=H, width=W, n_features=1024, n_levels=8)
CAM = make_pinhole(458.654, 457.296, 367.215, 248.375, W, H)
BF = jnp.float32(47.9)
MIN_Z = jnp.float32(47.9 / 458.654)
N_MAP = 2048  # local map points fed to search-by-projection


def make_frames(n=8):
    rng = np.random.default_rng(0)
    frames = []
    for _ in range(n):
        base = np.kron(
            rng.integers(0, 256, size=(H // 8, W // 8)), np.ones((8, 8))
        )
        frames.append(base.astype(np.float32))
    return frames


def tracking_step(img_l, img_r, map_uv, map_desc, map_points):
    # Stages are individually jitted; a single fused jit of the whole step
    # measured ~6x slower than the sum of stages on v5e (XLA mega-fusion
    # pathologies) with >10 min compiles. Python orchestration costs ~40 us
    # per dispatch.
    fd = process_stereo_frame(img_l, img_r, CFG, BF, MIN_Z)
    kps = fd.kps
    n = kps.capacity
    res = search_by_projection(
        map_uv,
        map_desc,
        jnp.full(N_MAP, 8.0),
        jnp.zeros(N_MAP, jnp.int32),
        jnp.full(N_MAP, 7, jnp.int32),
        jnp.ones(N_MAP, bool),
        jnp.stack([kps.x, kps.y], -1),
        kps.desc_signed,
        kps.level,
        kps.valid,
    )
    # Pose optimization over the (synthetic) associations.
    Xw = map_points
    obs_uv = jnp.stack([kps.x, kps.y], -1)[res.idx]
    obs_ur = fd.u_right[res.idx]
    sigma2 = jnp.ones(N_MAP)
    T = se3_identity()
    opt = pose_optimize(CAM, BF, T, Xw, obs_uv, obs_ur, sigma2, res.ok)
    return fd.n_valid, opt.n_inliers, opt.pose.t


def main():
    frames = make_frames()
    rng = np.random.default_rng(1)
    map_points = jnp.asarray(
        np.stack(
            [
                rng.uniform(-4, 4, N_MAP),
                rng.uniform(-3, 3, N_MAP),
                rng.uniform(4, 12, N_MAP),
            ],
            -1,
        ).astype(np.float32)
    )
    map_uv = jnp.asarray(rng.uniform(30, 450, size=(N_MAP, 2)).astype(np.float32))
    map_desc = jnp.asarray(
        (2 * rng.integers(0, 2, size=(N_MAP, 256)) - 1).astype(np.int8)
    )

    # Warmup / compile.
    out = tracking_step(
        jnp.asarray(frames[0]), jnp.asarray(frames[1]), map_uv, map_desc, map_points
    )
    jax.block_until_ready(out)

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        fl = frames[i % len(frames)]
        fr = frames[(i + 1) % len(frames)]
        out = tracking_step(
            jnp.asarray(fl), jnp.asarray(fr), map_uv, map_desc, map_points
        )
    jax.block_until_ready(out)
    dt_ms = (time.perf_counter() - t0) / iters * 1e3

    print(
        json.dumps(
            {
                "metric": "tracking_ms_per_frame",
                "value": round(dt_ms, 3),
                "unit": "ms",
                "vs_baseline": round(REFERENCE_MS / dt_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
