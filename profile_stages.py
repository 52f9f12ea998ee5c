"""Per-program on-chip timing of the current bench tracking step.

All programs are warm (persistent cache) — run right after bench.py.
Mirrors the reference's REGISTER_STATS per-kernel breakdown
(StereoMatchKernel.cu:636-706)."""

import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from fasttrack_tpu.cameras import make_pinhole
from fasttrack_tpu.frame_pipeline import _search_optimize_stage, _stereo_match_stage
from fasttrack_tpu.geometry import se3_identity
from fasttrack_tpu.ops import OrbConfig
from fasttrack_tpu.ops.extractor import extract_orb_pair

H, W = 480, 752
CFG = OrbConfig(height=H, width=W, n_features=1024, n_levels=8)
CAM = make_pinhole(458.654, 457.296, 367.215, 248.375, W, H)
BF = jnp.float32(47.9)
MIN_Z = jnp.float32(47.9 / 458.654)
N_MAP = 2048


def timeit(name, fn, iters=30):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn())
    sync = (time.perf_counter() - t0) / iters * 1e3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    pipe = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:32s} sync {sync:8.3f} ms   pipelined {pipe:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    base = np.kron(rng.integers(0, 256, size=(H // 8, W // 8)), np.ones((8, 8)))
    img = base.astype(np.uint8)
    map_pos = jnp.asarray(rng.uniform(-4, 4, (N_MAP, 3)).astype(np.float32))
    map_uv = jnp.asarray(rng.uniform(30, 450, size=(N_MAP, 2)).astype(np.float32))
    map_desc = jnp.asarray((2 * rng.integers(0, 2, size=(N_MAP, 256)) - 1).astype(np.int8))
    map_radius = jnp.full(N_MAP, 8.0)
    map_lmin = jnp.zeros(N_MAP, jnp.int32)
    map_lmax = jnp.full(N_MAP, 7, jnp.int32)
    map_ok = jnp.ones(N_MAP, bool)
    T0 = se3_identity()

    print(f"backend: {jax.devices()}", flush=True)
    il = jnp.asarray(img)
    ir = jnp.asarray(img)
    kl, kr, pl, pr = timeit("extract_orb_pair",
                            lambda: extract_orb_pair(il, ir, CFG))
    sm, _ = timeit(
        "stereo_match_stage",
        lambda: _stereo_match_stage(kl, kr, pl.raw, pr.raw, CFG, BF, MIN_Z),
    )
    timeit(
        "search_optimize_stage",
        lambda: _search_optimize_stage(
            kl, sm.u_right, CFG, BF, CAM, T0,
            map_uv, map_desc, map_pos, map_radius, map_lmin, map_lmax, map_ok,
        ),
    )


if __name__ == "__main__":
    main()
