#!/usr/bin/env python3
"""Measure the Pallas fused Hamming+penalty kernel against the XLA path on
the real TPU — the decision bench for wiring ops/pallas_kernels.py into the
matchers (VERDICT r3 weak #2).

Both variants run inside the same consumer shape the matchers use
(penalized matrix -> lax.top_k), jitted, timed over repeated dispatches
with per-iteration block_until_ready.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from fasttrack_tpu.ops.hamming import hamming_matrix_f32
from fasttrack_tpu.ops.pallas_kernels import hamming_penalty_matrix

BIG = 1e9


@jax.jit
def xla_path(q, k, qp, kp):
    d = hamming_matrix_f32(q, k)
    d = d + qp[:, None] + kp[None, :]
    return jax.lax.top_k(-d, 64)


@jax.jit
def pallas_path(q, k, qp, kp):
    d = hamming_penalty_matrix(q, k, qp, kp)
    return jax.lax.top_k(-d, 64)


def bench(fn, args, iters=200):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    rng = np.random.default_rng(0)
    results = {}
    for M, N in ((1024, 1024), (4096, 1024), (4096, 2048)):
        q = jnp.asarray(
            (2 * rng.integers(0, 2, (M, 256)) - 1).astype(np.int8))
        k = jnp.asarray(
            (2 * rng.integers(0, 2, (N, 256)) - 1).astype(np.int8))
        qp = jnp.asarray(
            (rng.random(M) < 0.2).astype(np.float32) * BIG)
        kp = jnp.asarray(
            (rng.random(N) < 0.2).astype(np.float32) * BIG)
        # correctness first
        dx = np.asarray(xla_path(q, k, qp, kp)[0])
        dp = np.asarray(pallas_path(q, k, qp, kp)[0])
        ok = bool(np.allclose(np.sort(dx, -1), np.sort(dp, -1)))
        t_xla = bench(xla_path, (q, k, qp, kp))
        t_pal = bench(pallas_path, (q, k, qp, kp))
        results[f"{M}x{N}"] = {
            "xla_us": round(t_xla, 1),
            "pallas_us": round(t_pal, 1),
            "speedup": round(t_xla / t_pal, 2),
            "topk_match": ok,
        }
        print(f"{M}x{N}: xla={t_xla:.1f}us pallas={t_pal:.1f}us "
              f"speedup={t_xla / t_pal:.2f} match={ok}")
    print(json.dumps({"bench": "pallas_hamming_penalty",
                      "backend": str(jax.devices()[0]), **results}))


if __name__ == "__main__":
    main()
