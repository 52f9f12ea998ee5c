#!/usr/bin/env python3
"""Multichip dist-BA scaling benchmark on the virtual CPU mesh.

Runs the landmark-sharded Schur-complement LM (parallel/dist_ba.py) on a
realistic covisibility window (default 100 KFs / 10k points, ~8
observations per point) at N = 1, 2, 4, 8 devices and reports
iterations/second per N — the scaling table VERDICT asked MULTICHIP to
carry.

CAVEAT printed with the result: with xla_force_host_platform_device_count
the N "devices" share one physical CPU, so the table validates the sharded
program (collective placement, per-shard work division) and measures
framework overhead vs N — it is NOT an ICI-bandwidth measurement. On real
multi-chip hardware each shard runs on its own chip.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python tools/bench_multichip.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def make_problem(K=100, L=10240, obs_per_point=8, seed=0):
    """Synthetic covisibility window: a forward trajectory viewing a point
    cloud; each point observed by `obs_per_point` consecutive keyframes."""
    from fasttrack_tpu.cameras import make_pinhole, project
    from fasttrack_tpu.geometry import SE3
    from fasttrack_tpu.optim import BAProblem

    rng = np.random.default_rng(seed)
    cam = make_pinhole(400.0, 400.0, 376.0, 240.0, 752, 480)
    bf = 40.0
    X = np.stack([
        rng.uniform(-8, 8, L), rng.uniform(-4, 4, L),
        rng.uniform(6, 20, L) + np.repeat(
            np.linspace(0, 0.4 * K, L // obs_per_point + 1),
            obs_per_point)[:L],
    ], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.stack([np.zeros(K), np.zeros(K), -0.4 * np.arange(K)], -1)
    t = t.astype(np.float32)

    obs_uv = np.zeros((L, K, 2), np.float32)
    obs_ur = np.full((L, K), -1.0, np.float32)
    mask = np.zeros((L, K), bool)
    # point l is observed by obs_per_point KFs around its "birth" keyframe
    birth = (np.arange(L) * K // L).astype(np.int32)
    for l in range(L):
        for k in range(birth[l], min(birth[l] + obs_per_point, K)):
            Xc = R[k] @ X[l] + t[k]
            if Xc[2] < 0.5:
                continue
            u = 400.0 * Xc[0] / Xc[2] + 376.0
            v = 400.0 * Xc[1] / Xc[2] + 240.0
            if 0 <= u < 752 and 0 <= v < 480:
                obs_uv[l, k] = (u + rng.normal(0, 0.3), v + rng.normal(0, 0.3))
                obs_ur[l, k] = u - bf / Xc[2]
                mask[l, k] = True

    prob = BAProblem(
        poses=SE3(jnp.asarray(R), jnp.asarray(t + rng.normal(0, 0.02, t.shape)
                                              .astype(np.float32))),
        points=jnp.asarray(X + rng.normal(0, 0.05, X.shape).astype(np.float32)),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        inv_sigma2=jnp.ones((L, K)),
        mask=jnp.asarray(mask),
        cam_free=jnp.asarray(np.arange(K) >= 2),
        point_free=jnp.ones(L, bool),
    )
    return prob, cam, bf, int(mask.sum())


def worker(process_id: int, num_processes: int, port: int):
    """Multi-process (DCN-analog) worker: join the process group, build the
    SAME seeded window on every process, shard it over the GLOBAL mesh, and
    run the landmark-sharded LM — cross-process psum over Gloo (on real
    hardware: DCN between hosts, ICI within a slice)."""
    from fasttrack_tpu.parallel import (
        distributed_bundle_adjustment,
        initialize_distributed,
        make_global_mesh,
        shard_ba_problem,
    )

    joined = initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id,
    )
    assert joined
    K = int(os.environ.get("BMC_K", 40))
    L = int(os.environ.get("BMC_L", 4096))
    iters = int(os.environ.get("BMC_ITERS", 6))
    prob, cam, bf, n_obs = make_problem(K=K, L=L, obs_per_point=6)
    mesh = make_global_mesh()
    gprob = shard_ba_problem(prob, mesh)
    t0 = time.perf_counter()
    _, _, costs, inlier, _ = distributed_bundle_adjustment(
        gprob, cam, bf, mesh, iters=iters
    )
    dt = time.perf_counter() - t0
    if process_id == 0:
        print("MULTIHOST " + json.dumps({
            "bench": "dist_ba_multihost",
            "processes": num_processes,
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
            "window": {"keyframes": K, "points": L, "observations": n_obs},
            "iters": iters,
            "seconds": round(dt, 2),
            "cost_initial": round(float(costs[0]), 3),
            "cost_final": round(float(costs[-1]), 3),
        }), flush=True)


def run_multiprocess(num_processes: int, devices_per_process: int = 4,
                     port: int = 43217):
    """Spawn N local processes x M virtual CPU devices each and run the
    worker in every one (the multi-host dry-run available without N real
    hosts). Returns process 0's MULTIHOST json line."""
    import subprocess

    here = os.path.abspath(__file__)
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_process}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        env["BMC_WORKER"] = f"{pid}:{num_processes}:{port}"
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.dirname(here))
            + os.pathsep + env.get("PYTHONPATH", "")
        )
        procs.append(subprocess.Popen(
            [sys.executable, here], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}:\n{o[-2000:]}")
    for line in outs[0].splitlines():
        if line.startswith("MULTIHOST "):
            print(line, flush=True)
            return json.loads(line[len("MULTIHOST "):])
    raise RuntimeError(f"no MULTIHOST line in worker 0 output:\n{outs[0][-2000:]}")


def main():
    from fasttrack_tpu.parallel import distributed_bundle_adjustment, make_mesh

    K = int(os.environ.get("BMC_K", 100))
    L = int(os.environ.get("BMC_L", 10240))
    iters = int(os.environ.get("BMC_ITERS", 8))
    prob, cam, bf, n_obs = make_problem(K=K, L=L)
    table = []
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(n)
        # warmup (compile)
        distributed_bundle_adjustment(prob, cam, bf, mesh, iters=1)
        t0 = time.perf_counter()
        _, _, costs, _, _ = distributed_bundle_adjustment(
            prob, cam, bf, mesh, iters=iters
        )
        dt = time.perf_counter() - t0
        table.append({
            "n_devices": n,
            "iters_per_s": round(iters / dt, 2),
            "s_per_iter": round(dt / iters, 3),
            "cost_initial": round(float(costs[0]), 1),
            "cost_final": round(float(costs[-1]), 3),
        })
        print(f"N={n}: {iters / dt:.2f} it/s  cost {costs[0]:.0f} -> {costs[-1]:.0f}")
    out = {
        "bench": "dist_ba_scaling",
        "window": {"keyframes": K, "points": L, "observations": n_obs},
        "iters": iters,
        "table": table,
        "caveat": "virtual CPU mesh shares one physical CPU: validates the "
                  "sharded program + overhead-vs-N, not ICI bandwidth",
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if os.environ.get("BMC_WORKER"):
        pid, nproc, port = os.environ["BMC_WORKER"].split(":")
        worker(int(pid), int(nproc), int(port))
    elif "--processes" in sys.argv:
        n = int(sys.argv[sys.argv.index("--processes") + 1])
        run_multiprocess(n)
    else:
        main()
