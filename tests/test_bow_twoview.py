"""Tests for the BoW subsystem and monocular two-view reconstruction."""

import numpy as np
import jax.numpy as jnp

from fasttrack_tpu.bow import KeyFrameDatabase, Vocabulary, l1_score, train_vocabulary
from fasttrack_tpu.bow.vocabulary import make_random_vocabulary, quantize
from fasttrack_tpu.optim.two_view import reconstruct_two_view


def random_descs(rng, n):
    return (2 * rng.integers(0, 2, size=(n, 256)) - 1).astype(np.int8)


class TestVocabulary:
    def test_train_and_quantize(self, rng):
        # clustered descriptors: 32 prototypes with small perturbations
        protos = random_descs(rng, 32)
        descs = np.repeat(protos, 40, axis=0)
        flips = rng.integers(0, 256, size=(len(descs), 8))
        for i, f in enumerate(flips):
            descs[i, f] *= -1
        voc = train_vocabulary(descs, n_words=32, iters=6)
        # quantization maps perturbed copies of a prototype to one word
        wid, bow = quantize(voc, descs[:40])
        assert len(np.unique(wid)) <= 3
        assert abs(sum(bow.values()) - 1.0) < 1e-6

    def test_l1_score_properties(self, rng):
        voc = make_random_vocabulary(256)
        d1 = random_descs(rng, 100)
        d2 = random_descs(rng, 100)
        _, b1 = quantize(voc, d1)
        _, b2 = quantize(voc, d2)
        assert abs(l1_score(b1, b1) - 1.0) < 1e-6
        s12 = l1_score(b1, b2)
        assert 0.0 <= s12 < 1.0
        assert l1_score(b1, {}) == 0.0

    def test_save_load_roundtrip(self, rng, tmp_path):
        voc = make_random_vocabulary(64)
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        voc2 = Vocabulary.load(p)
        np.testing.assert_array_equal(voc.words_signed, voc2.words_signed)


class TestTreeVocabulary:
    def test_tree_quantize_groups_prototypes(self, rng):
        """Perturbed copies of a prototype land on the same leaf through the
        staged node->child argmin (DBoW2 tree-quantization semantics)."""
        from fasttrack_tpu.bow.vocabulary import train_tree_vocabulary

        protos = random_descs(rng, 64)
        descs = np.repeat(protos, 40, axis=0)
        flips = rng.integers(0, 256, size=(len(descs), 8))
        for i, f in enumerate(flips):
            descs[i, f] *= -1
        voc = train_tree_vocabulary(descs, branches=8, children=16, iters=4)
        assert voc.n_words == 128
        wid, bow = quantize(voc, descs[:40])
        assert len(np.unique(wid)) <= 3
        assert abs(sum(bow.values()) - 1.0) < 1e-6
        # deterministic
        wid2, _ = quantize(voc, descs[:40])
        np.testing.assert_array_equal(wid, wid2)

    def test_tree_save_load_and_dispatch(self, rng, tmp_path):
        from fasttrack_tpu.bow.vocabulary import (
            TreeVocabulary, load_vocabulary, train_tree_vocabulary,
        )

        descs = random_descs(rng, 600)
        voc = train_tree_vocabulary(descs, branches=4, children=8, iters=2)
        p = str(tmp_path / "tree.npz")
        voc.save(p)
        voc2 = load_vocabulary(p)
        assert isinstance(voc2, TreeVocabulary)
        np.testing.assert_array_equal(voc.leaves_packed, voc2.leaves_packed)
        w1, _ = quantize(voc, descs[:50])
        w2, _ = quantize(voc2, descs[:50])
        np.testing.assert_array_equal(w1, w2)
        # the flat loader path still works
        flat = make_random_vocabulary(64)
        pf = str(tmp_path / "flat.npz")
        flat.save(pf)
        assert not isinstance(load_vocabulary(pf), TreeVocabulary)


class TestKeyFrameDatabase:
    def test_detects_same_place(self, rng):
        voc = make_random_vocabulary(512)
        db = KeyFrameDatabase()
        base = random_descs(rng, 200)
        bows = []
        for k in range(8):
            d = base.copy() if k == 5 else random_descs(rng, 200)
            # place 5 is a slightly perturbed copy of the query scene
            _, bow = quantize(voc, d)
            db.add(k, bow)
            bows.append(bow)
        # query resembles place 5
        q = base.copy()
        flip = rng.integers(0, 200, size=20)
        q[flip] = random_descs(rng, 20)
        _, qbow = quantize(voc, q)
        cands = db.detect_relocalization_candidates(qbow)
        assert cands[0] == 5

    def test_loop_candidates_exclude_connected(self, rng):
        voc = make_random_vocabulary(512)
        db = KeyFrameDatabase()
        base = random_descs(rng, 200)
        for k in range(4):
            _, bow = quantize(voc, base)  # all identical places
            db.add(k, bow)
        _, qbow = quantize(voc, base)
        cands = db.detect_loop_candidates(qbow, kf_id=3, connected={2})
        assert 3 not in cands and 2 not in cands
        assert set(cands) <= {0, 1}

    def test_erase(self, rng):
        voc = make_random_vocabulary(128)
        db = KeyFrameDatabase()
        d = random_descs(rng, 50)
        _, bow = quantize(voc, d)
        db.add(1, bow)
        db.erase(1)
        assert db.detect_relocalization_candidates(bow) == []


class TestTwoView:
    def make_pair(self, rng, n=200, planar=False, noise=0.3):
        K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
        if planar:
            X = np.stack(
                [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), np.full(n, 6.0)], -1
            )
        else:
            X = np.stack(
                [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
            )
        from scipy.spatial.transform import Rotation

        R = Rotation.from_rotvec([0.02, -0.05, 0.01]).as_matrix()
        t = np.array([0.3, 0.05, 0.02])
        X2 = X @ R.T + t
        p1 = (X @ K.T)
        p1 = p1[:, :2] / p1[:, 2:]
        p2 = (X2 @ K.T)
        p2 = p2[:, :2] / p2[:, 2:]
        p1 += rng.normal(size=p1.shape) * noise
        p2 += rng.normal(size=p2.shape) * noise
        return p1.astype(np.float32), p2.astype(np.float32), K, R, t, X

    def check(self, res, R, t, X):
        assert res.success
        # rotation error
        ang = np.rad2deg(
            np.arccos(np.clip((np.trace(res.R.T @ R) - 1) / 2, -1, 1))
        )
        assert ang < 1.0, ang
        # translation direction error
        cos = abs(res.t @ (t / np.linalg.norm(t)))
        assert cos > 0.995, cos
        # triangulated structure (scale-ambiguous): compare normalized depth
        g = res.good_mask
        scale = np.median(X[g, 2] / res.points3d[g, 2])
        err = np.linalg.norm(res.points3d[g] * scale - X[g], axis=1)
        assert np.median(err) < 0.15

    def test_general_scene_uses_fundamental(self, rng):
        p1, p2, K, R, t, X = self.make_pair(rng, planar=False)
        res = reconstruct_two_view(p1, p2, K)
        assert not res.used_homography
        self.check(res, R, t, X)

    def test_planar_scene_uses_homography(self, rng):
        p1, p2, K, R, t, X = self.make_pair(rng, planar=True)
        res = reconstruct_two_view(p1, p2, K)
        assert res.used_homography
        self.check(res, R, t, X)

    def test_with_outliers(self, rng):
        p1, p2, K, R, t, X = self.make_pair(rng)
        n_out = 40
        idx = rng.choice(len(p1), n_out, replace=False)
        p2[idx] += rng.uniform(30, 80, size=(n_out, 2)).astype(np.float32)
        res = reconstruct_two_view(p1, p2, K)
        self.check(res, R, t, X)
        assert res.good_mask[idx].sum() < 5

    def test_insufficient_matches_fails(self, rng):
        p1, p2, K, R, t, X = self.make_pair(rng, n=200)
        valid = np.zeros(len(p1), bool)
        valid[:10] = True
        res = reconstruct_two_view(p1, p2, K, valid=valid)
        assert not res.success
