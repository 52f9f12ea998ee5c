"""Binary visual vocabulary: flat word centroids, MXU quantization.

Replaces DBoW2::TemplatedVocabulary (Thirdparty/DBoW2). Training is
k-majority (binary k-means: Hamming assignment via MXU matmul + per-bit
majority vote update); quantization of a frame's descriptors is one
(N, 256) x (256, W) int8 matmul + argmin. tf-idf weighting and L1 scoring
follow DBoW2 (TF_IDF / L1_NORM defaults used by ORBVocabulary).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from fasttrack_tpu.ops.hamming import hamming_matrix


class Vocabulary(NamedTuple):
    words_signed: np.ndarray  # (W, 256) int8 +-1 centroids
    idf: np.ndarray           # (W,) float32

    @property
    def n_words(self) -> int:
        return len(self.words_signed)

    def save(self, path: str):
        np.savez_compressed(path, words=self.words_signed, idf=self.idf)

    @staticmethod
    def load(path: str) -> "Vocabulary":
        d = np.load(path)
        return Vocabulary(d["words"], d["idf"])


_DEFAULT_VOCAB = None


def load_default_vocabulary():
    """The shipped vocabulary artifact (the reference always loads
    Vocabulary/ORBvoc.txt, System.cc:130-146; ours is a k-majority vocab
    trained on ORB descriptors from varied synthetic scenes,
    tools/train_default_vocab.py). Cached per process."""
    global _DEFAULT_VOCAB
    if _DEFAULT_VOCAB is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "orb_vocab.npz")
        _DEFAULT_VOCAB = Vocabulary.load(path)
    return _DEFAULT_VOCAB


@jax.jit
def _assign(descs: jnp.ndarray, words: jnp.ndarray) -> jnp.ndarray:
    d = hamming_matrix(descs, words)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def train_vocabulary(
    descs_signed: np.ndarray, n_words: int = 2048, iters: int = 8, seed: int = 0
) -> Vocabulary:
    """k-majority clustering of +-1 descriptors."""
    rng = np.random.default_rng(seed)
    n = len(descs_signed)
    if n < n_words:
        raise ValueError(f"need >= {n_words} descriptors, got {n}")
    centers = descs_signed[rng.choice(n, n_words, replace=False)].copy()
    dj = jnp.asarray(descs_signed)
    for _ in range(iters):
        assign = np.asarray(_assign(dj, jnp.asarray(centers)))
        # per-cluster per-bit majority vote
        sums = np.zeros((n_words, descs_signed.shape[1]), np.int32)
        np.add.at(sums, assign, descs_signed.astype(np.int32))
        counts = np.bincount(assign, minlength=n_words)
        new = np.where(sums >= 0, 1, -1).astype(np.int8)
        # keep old center for empty clusters; re-seed tiny ones
        empty = counts == 0
        new[empty] = centers[empty]
        centers = new
    # idf from training corpus treated as one document per descriptor burst:
    assign = np.asarray(_assign(dj, jnp.asarray(centers)))
    df = np.bincount(assign, minlength=n_words).astype(np.float64)
    idf = np.log(n / np.maximum(df, 1.0)).astype(np.float32)
    return Vocabulary(centers, idf)


def quantize(voc: Vocabulary, descs_signed: np.ndarray, valid: np.ndarray | None = None):
    """Descriptors -> (word_ids (N,), bow dict word -> tf-idf weight).

    The bow vector is L1-normalized (DBoW2 L1_NORM)."""
    if len(descs_signed) == 0:
        return np.empty(0, np.int32), {}
    wid = np.asarray(_assign(jnp.asarray(descs_signed), jnp.asarray(voc.words_signed)))
    if valid is not None:
        sel = wid[valid]
    else:
        sel = wid
    if len(sel) == 0:
        return wid, {}
    counts = np.bincount(sel, minlength=voc.n_words).astype(np.float64)
    w = counts * voc.idf
    s = w.sum()
    if s > 0:
        w /= s
    nz = np.nonzero(w)[0]
    return wid, {int(i): float(w[i]) for i in nz}


def l1_score(v1: dict, v2: dict) -> float:
    """DBoW2 L1 score between L1-normalized bow vectors:
    s = 1 - 0.5 * |v1 - v2|_1 in [0, 1]; computed sparsely."""
    if not v1 or not v2:
        return 0.0
    score = 0.0
    for w, x in v1.items():
        y = v2.get(w)
        if y is not None:
            score += abs(x) + abs(y) - abs(x - y)
    return 0.5 * score


def make_random_vocabulary(n_words: int = 2048, seed: int = 7) -> Vocabulary:
    """A deterministic random vocabulary for bootstrapping (usable before
    any training data exists; words are random +-1 vectors, uniform idf)."""
    rng = np.random.default_rng(seed)
    words = (2 * rng.integers(0, 2, size=(n_words, 256)) - 1).astype(np.int8)
    return Vocabulary(words, np.ones(n_words, np.float32))
