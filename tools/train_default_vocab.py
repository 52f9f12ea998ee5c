"""Train and ship the default ORB vocabulary artifact.

The reference always loads Vocabulary/ORBvoc.txt (System.cc:130-146; a
DBoW2 vocabulary trained offline on a large image corpus). This build ships
a k-majority binary vocabulary trained on ORB descriptors extracted from a
varied set of synthetic scenes (multi-scale noise textures at many
viewpoints/scales) — enough appearance diversity for loop-closure and
relocalization recall on the target workloads, at ~1 MB instead of 145 MB.

Run:  JAX_PLATFORMS=cpu python tools/train_default_vocab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fasttrack_tpu.bow.vocabulary import Vocabulary, train_vocabulary
from fasttrack_tpu.datasets.synthetic import make_texture, _render
from fasttrack_tpu.ops import OrbConfig
from fasttrack_tpu.ops.host_kernels import host_extract_orb


def main(n_words=4096, n_scenes=12, views_per_scene=6):
    H, W = 480, 752
    cfg = OrbConfig(height=H, width=W, n_features=1024, n_levels=8)
    K = np.array([[458.0, 0, W / 2], [0, 458.0, H / 2], [0, 0, 1.0]])
    descs = []
    for s in range(n_scenes):
        rng = np.random.default_rng(100 + s)
        tex = make_texture(rng, size=1024)
        for v in range(views_per_scene):
            ang = 0.15 * (v - views_per_scene / 2)
            ca, sa = np.cos(ang), np.sin(ang)
            R_wc = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
            t_wc = np.array([0.3 * v - 1.0, 0.1 * (v % 3), -0.2 * v])
            img = _render(tex, 180.0, K, R_wc, t_wc, H, W, plane_z=6.0)
            kps = host_extract_orb(img.astype(np.uint8), cfg)
            d = kps.desc_signed[kps.valid]
            descs.append(d)
            print(f"scene {s} view {v}: {len(d)} descriptors", flush=True)
    alld = np.concatenate(descs)
    print(f"training on {len(alld)} descriptors -> {n_words} words", flush=True)
    voc = train_vocabulary(alld, n_words=n_words, iters=10, seed=0)
    out = os.path.join(os.path.dirname(__file__), "..",
                       "fasttrack_tpu", "bow", "orb_vocab.npz")
    voc.save(out)
    print(f"saved {out} ({os.path.getsize(out + '.npz' if not os.path.exists(out) else out)} bytes)")


if __name__ == "__main__":
    main()
