"""Benchmark: per-frame tracking hot path on the default JAX backend (TPU).

Measures the full per-frame compute pipeline the reference times as
"tracking ms/frame" (BASELINE.md): host->device image upload, stereo ORB
extraction (pyramid/FAST/orientation/BRIEF), rectified stereo matching,
search-by-projection against a local map, and motion-only pose optimization
— in exactly two device programs (see frame_pipeline.tracking_hot_path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the reference's best published number
(all-GPU, PO off: 6.83 ms/frame on EuRoC MH01, grouped_plot.ipynb).

Fails loudly (non-zero exit, error JSON on stdout) if the accelerator
backend cannot initialize or produces garbage, and retries backend init —
a transient tunnel failure must never ship as the round's number.
"""

import json
import sys
import time

import numpy as np

REFERENCE_MS = 6.83  # MH01, all-GPU, PO off (BASELINE.md)

H, W = 480, 752
N_MAP = 2048  # local map points fed to search-by-projection


def _init_backend():
    """Import jax and force backend init, retrying transient failures."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    last_err = None
    for attempt in range(3):
        try:
            devs = jax.devices()
            if devs:
                return jax, devs
        except Exception as e:  # backend init failure (e.g. axon tunnel)
            last_err = e
            time.sleep(2.0 * (attempt + 1))
    raise RuntimeError(f"JAX backend failed to initialize: {last_err}")


def make_frames(n=8):
    rng = np.random.default_rng(0)
    frames = []
    for _ in range(n):
        base = np.kron(
            rng.integers(0, 256, size=(H // 8, W // 8)), np.ones((8, 8))
        )
        frames.append(base.astype(np.uint8))
    return frames


def main():
    try:
        jax, devs = _init_backend()
    except RuntimeError as e:
        print(json.dumps({"metric": "tracking_ms_per_frame", "value": None,
                          "unit": "ms", "vs_baseline": None, "error": str(e)}))
        sys.exit(1)

    import jax.numpy as jnp

    from fasttrack_tpu.cameras import make_pinhole
    from fasttrack_tpu.frame_pipeline import tracking_hot_path
    from fasttrack_tpu.geometry import se3_identity
    from fasttrack_tpu.ops import OrbConfig

    cfg = OrbConfig(height=H, width=W, n_features=1024, n_levels=8)
    cam = make_pinhole(458.654, 457.296, 367.215, 248.375, W, H)
    bf = jnp.float32(47.9)
    min_z = jnp.float32(47.9 / 458.654)

    frames = make_frames()
    rng = np.random.default_rng(1)
    # All map-side operands staged on device ONCE (persistent residency,
    # KernelController.cu:100-117): per-frame host->device traffic is the
    # two uint8 images only.
    map_pos = jnp.asarray(
        np.stack(
            [rng.uniform(-4, 4, N_MAP), rng.uniform(-3, 3, N_MAP),
             rng.uniform(4, 12, N_MAP)], -1,
        ).astype(np.float32)
    )
    map_uv = jnp.asarray(rng.uniform(30, 450, size=(N_MAP, 2)).astype(np.float32))
    map_desc = jnp.asarray(
        (2 * rng.integers(0, 2, size=(N_MAP, 256)) - 1).astype(np.int8)
    )
    map_radius = jnp.full(N_MAP, 8.0)
    map_lmin = jnp.zeros(N_MAP, jnp.int32)
    map_lmax = jnp.full(N_MAP, 7, jnp.int32)
    map_ok = jnp.ones(N_MAP, bool)
    T0 = se3_identity()

    def step(fl, fr):
        return tracking_hot_path(
            jnp.asarray(fl), jnp.asarray(fr), cfg, bf, min_z, cam, T0,
            map_uv, map_desc, map_pos, map_radius, map_lmin, map_lmax, map_ok,
        )

    # Warmup / compile.
    fd, res, opt = step(frames[0], frames[1])
    jax.block_until_ready(opt)
    n_valid = int(fd.n_valid)
    if not (np.isfinite(np.asarray(opt.pose.t)).all() and n_valid > 0):
        print(json.dumps({"metric": "tracking_ms_per_frame", "value": None,
                          "unit": "ms", "vs_baseline": None,
                          "error": f"garbage output (n_valid={n_valid})"}))
        sys.exit(1)

    iters = 50
    t0 = time.perf_counter()
    for i in range(iters):
        out = step(frames[i % len(frames)], frames[(i + 1) % len(frames)])
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
