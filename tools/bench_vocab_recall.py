#!/usr/bin/env python3
"""Loop/reloc recall benchmark for the shipped vocabularies.

A long synthetic revisit sequence (default 300 frames: an outbound camera
sweep that returns over the same ground) is quantized frame by frame into a
KeyFrameDatabase; for every revisit frame we query the database (excluding
temporal neighbors) and score recall@k: whether a frame showing the SAME
ground-truth view area is among the top-k candidates.

Run:  JAX_PLATFORMS=cpu python tools/bench_vocab_recall.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(n_frames=300, k=5):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from fasttrack_tpu.bow import KeyFrameDatabase
    from fasttrack_tpu.bow.vocabulary import (
        load_default_vocabulary, quantize,
    )
    from fasttrack_tpu.datasets.synthetic import make_texture, _render
    from fasttrack_tpu.ops import OrbConfig
    from fasttrack_tpu.ops.host_kernels import host_extract_orb

    H, W = 240, 320
    cfg = OrbConfig(height=H, width=W, n_features=512, n_levels=4)
    K = np.array([[256.0, 0, W / 2], [0, 256.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(11)
    tex = make_texture(rng, size=2048)

    # out-and-back sweep: x goes 0 -> L -> 0; frame i and frame (N-1-i)
    # view the same ground
    half = n_frames // 2
    xs = np.concatenate([np.linspace(0, 6.0, half),
                         np.linspace(6.0, 0, n_frames - half)])

    results = {}
    for name, voc in [("default", load_default_vocabulary())]:
        db = KeyFrameDatabase()
        bows = []
        t_q = 0.0
        for i in range(n_frames):
            img = _render(tex, 110.0, K, np.eye(3),
                          np.array([xs[i], 0.0, 0.0]), H, W, plane_z=5.0)
            kps = host_extract_orb(img.astype(np.uint8), cfg)
            t0 = time.perf_counter()
            _, bow = quantize(voc, kps.desc_signed, kps.valid)
            t_q += time.perf_counter() - t0
            bows.append(bow)
            db.add(i, bow)

        hits = 0
        total = 0
        for i in range(half + 10, n_frames):
            # ground-truth revisit partner: same x on the outbound leg
            gt = int(np.argmin(np.abs(xs[:half] - xs[i])))
            connected = set(range(i - 20, n_frames))  # exclude neighbors
            cands = db.detect_loop_candidates(
                bows[i], i, connected, covisible=lambda k: [], n_best=k
            )
            total += 1
            if any(abs(c - gt) <= 5 for c in cands):
                hits += 1
        results[name] = {
            "n_words": voc.n_words,
            "recall_at_k": round(hits / max(total, 1), 3),
            "queries": total,
            "quantize_ms_per_frame": round(1e3 * t_q / n_frames, 2),
        }
        print(f"{name}: {results[name]}")
    print(json.dumps({"bench": "vocab_recall", "k": k,
                      "n_frames": n_frames, **results}))


if __name__ == "__main__":
    main()
