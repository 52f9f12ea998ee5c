"""On-chip golden test: TPU extraction + stereo matching vs the CPU oracle.

Runs the SAME deterministic image through the jitted pipeline on the real
TPU (default backend) and on CPU, and asserts the results agree — catching
TPU-specific numerics (bf16 matmul defaults, tiling padding, int8 MXU
accumulation) that the CPU-only test suite cannot see.

Run right after bench:  python tools/tpu_golden_check.py
Writes a one-line JSON verdict to stdout and exits non-zero on mismatch.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from fasttrack_tpu.datasets.synthetic import make_texture, _render
from fasttrack_tpu.frame_pipeline import _stereo_match_stage
from fasttrack_tpu.ops import OrbConfig
from fasttrack_tpu.ops.extractor import extract_orb_pair_stacked

H, W = 480, 752
CFG = OrbConfig(height=H, width=W, n_features=1024, n_levels=8)


def run_on(device):
    rng = np.random.default_rng(42)
    tex = make_texture(rng, size=1024)
    K = np.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1.0]])
    left = _render(tex, 170.0, K, np.eye(3), np.zeros(3), H, W, 5.0)
    right = _render(tex, 170.0, K, np.eye(3), np.array([0.3, 0, 0]), H, W, 5.0)
    stacked = np.stack([left, right]).astype(np.uint8)
    with jax.default_device(device):
        imgs = jnp.asarray(stacked)
        kl, kr, pl, pr = extract_orb_pair_stacked(imgs, CFG)
        sm, nv = _stereo_match_stage(
            kl, kr, pl.raw, pr.raw, CFG,
            jnp.float32(0.3 * 400.0), jnp.float32(0.3),
        )
        jax.block_until_ready(sm)
        return {
            "x": np.asarray(kl.x), "y": np.asarray(kl.y),
            "level": np.asarray(kl.level), "valid": np.asarray(kl.valid),
            "desc": np.asarray(kl.desc_packed),
            "u_right": np.asarray(sm.u_right), "depth": np.asarray(sm.depth),
            "sm_valid": np.asarray(sm.valid),
        }


def main():
    tpu = [d for d in jax.devices() if d.platform != "cpu"]
    cpu = jax.devices("cpu")
    if not tpu:
        print(json.dumps({"golden": "skip", "reason": "no accelerator"}))
        return
    a = run_on(tpu[0])
    b = run_on(cpu[0])

    report = {}
    ok = True
    n_det_a, n_det_b = int(a["valid"].sum()), int(b["valid"].sum())
    report["n_kp_tpu"] = n_det_a
    report["n_kp_cpu"] = n_det_b
    # SET-based keypoint comparison: slot order differs between backends
    # (top-k tie-breaking); the detected (x, y, level) sets must agree.
    def keyset(r):
        v = r["valid"]
        return {
            (int(round(2 * x)), int(round(2 * y)), int(l))
            for x, y, l in zip(r["x"][v], r["y"][v], r["level"][v])
        }

    ka, kb = keyset(a), keyset(b)
    inter = ka & kb
    report["kp_set_match"] = round(len(inter) / max(min(len(ka), len(kb)), 1), 4)
    if report["kp_set_match"] < 0.97:
        ok = False
    # descriptors of co-detected keypoints: match by position key
    pos_to_idx_b = {}
    vb = np.where(b["valid"])[0]
    for i in vb:
        pos_to_idx_b[(int(round(2 * b["x"][i])), int(round(2 * b["y"][i])),
                      int(b["level"][i]))] = i
    pairs = []
    va = np.where(a["valid"])[0]
    for i in va:
        k = (int(round(2 * a["x"][i])), int(round(2 * a["y"][i])),
             int(a["level"][i]))
        j = pos_to_idx_b.get(k)
        if j is not None:
            pairs.append((i, j))
    ia = np.asarray([p[0] for p in pairs])
    ib = np.asarray([p[1] for p in pairs])
    xo = np.unpackbits(a["desc"][ia] ^ b["desc"][ib], axis=1).sum(1)
    report["desc_mean_bits_diff"] = round(float(xo.mean()), 3)
    report["desc_p99_bits_diff"] = float(np.percentile(xo, 99))
    if xo.mean() > 4.0:
        ok = False
    # stereo depth on co-detected keypoints with depth on both backends
    both_sm = a["sm_valid"][ia] & b["sm_valid"][ib]
    report["n_stereo_tpu"] = int(a["sm_valid"].sum())
    report["n_stereo_cpu"] = int(b["sm_valid"].sum())
    dd = np.abs(a["depth"][ia][both_sm] - b["depth"][ib][both_sm])
    report["depth_med_absdiff_m"] = round(float(np.median(dd)), 5) if len(dd) else None
    if len(dd) == 0 or np.median(dd) > 0.05:
        ok = False
    report["golden"] = "pass" if ok else "FAIL"
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
