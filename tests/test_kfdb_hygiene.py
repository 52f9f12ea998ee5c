"""KeyFrameDatabase hygiene: culled/cleared keyframes must leave the
inverted index (KeyFrame::SetBadFlag -> KeyFrameDatabase::erase,
KeyFrameDatabase.cc:39-62; Map/Atlas reset paths likewise), and an atlas
pickle carries a vocabulary checksum guard (System.cc:1424-1464)."""

import numpy as np
import pytest

from fasttrack_tpu.bow.database import KeyFrameDatabase
from fasttrack_tpu.bow.vocabulary import Vocabulary, vocabulary_checksum
from fasttrack_tpu.datasets.synthetic import generate_sequence
from fasttrack_tpu.slam_map import KeyFrame, Map

from tests.test_tracking_e2e import make_system


def _mini_kf(kid, n=8):
    rng = np.random.default_rng(kid)
    return KeyFrame(
        kid, kid, float(kid), np.eye(3), np.zeros(3),
        rng.uniform(0, 100, (n, 2)), np.zeros(n, np.int32),
        np.zeros(n, np.float32),
        rng.integers(0, 256, (n, 32), dtype=np.uint8).astype(np.uint8),
        rng.integers(0, 2, (n, 256)).astype(np.int8) * 2 - 1,
        np.full(n, -1.0), np.full(n, -1.0), np.ones(n, bool),
    )


class TestDatabaseErase:
    def test_erase_keyframe_erases_db_entry(self):
        m = Map(0)
        db = KeyFrameDatabase()
        m.kf_db = db
        bows = {1: {3: 0.5, 7: 0.5}, 2: {3: 0.6, 9: 0.4}}
        for kid, bow in bows.items():
            kf = _mini_kf(kid)
            m.add_keyframe(kf)
            db.add(kid, bow)
        # kid 2 shares word 3 with the query -> is a candidate before erase
        assert 2 in db.detect_relocalization_candidates({3: 1.0})
        m.erase_keyframe(2)
        assert 2 not in db.kf_bows
        assert all(2 not in kfs for kfs in db.inverted.values())
        assert 2 not in db.detect_relocalization_candidates({3: 1.0})
        # kid 1 survives
        assert 1 in db.kf_bows

    def test_map_clear_erases_all_db_entries(self):
        m = Map(0)
        db = KeyFrameDatabase()
        m.kf_db = db
        for kid in range(5):
            m.add_keyframe(_mini_kf(kid))
            db.add(kid, {kid: 1.0, 100: 0.1})
        m.clear()
        assert not db.kf_bows
        assert all(not kfs for kfs in db.inverted.values())

    def test_atlas_remove_map_erases_entries(self):
        from fasttrack_tpu.slam_map import Atlas

        atlas = Atlas()
        db = KeyFrameDatabase()
        atlas.set_kf_database(db)
        m = atlas.current
        assert m.kf_db is db
        for kid in range(3):
            m.add_keyframe(_mini_kf(kid))
            db.add(kid, {kid: 1.0})
        m2 = atlas.create_new_map()
        assert m2.kf_db is db
        atlas.remove_map(m)
        assert not db.kf_bows


class TestDatabaseBoundedE2E:
    def test_db_tracks_live_keyframes(self):
        """After a full synthetic run the inverted index must contain only
        keyframes still alive in some atlas map — no ghosts from culling."""
        seq = generate_sequence(n_frames=30, h=240, w=320, seed=3)
        sys = make_system(seq)
        assert sys.loop_closer is not None
        for fr in seq.frames:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        sys.shutdown()
        live = set()
        for m in sys.atlas.maps:
            live |= set(m.keyframes)
        db = sys.loop_closer.db
        assert set(db.kf_bows) <= live
        for kfs in db.inverted.values():
            assert kfs <= live


class TestVocabChecksumGuard:
    def test_checksum_stable_and_distinct(self, rng):
        v1 = Vocabulary(
            (rng.integers(0, 2, (16, 256)) * 2 - 1).astype(np.int8),
            np.ones(16, np.float32),
        )
        v2 = Vocabulary(
            (rng.integers(0, 2, (16, 256)) * 2 - 1).astype(np.int8),
            np.ones(16, np.float32),
        )
        assert vocabulary_checksum(v1) == vocabulary_checksum(v1)
        assert vocabulary_checksum(v1) != vocabulary_checksum(v2)
        assert vocabulary_checksum(None) == ""
        assert vocabulary_checksum(False) == ""

    def test_load_refuses_mismatched_vocabulary(self, tmp_path):
        seq = generate_sequence(n_frames=12, h=240, w=320, seed=3)
        sys = make_system(seq)
        for fr in seq.frames[:8]:
            sys.track_stereo(fr.left, fr.right, fr.timestamp)
        path = str(tmp_path / "atlas.pkl")
        sys.save_atlas(path)
        sys2 = make_system(seq)
        sys2.load_atlas(path)  # same (default) vocabulary: fine
        rng = np.random.default_rng(0)
        other = Vocabulary(
            (rng.integers(0, 2, (32, 256)) * 2 - 1).astype(np.int8),
            np.ones(32, np.float32),
        )
        sys3 = make_system(seq)
        sys3.vocabulary = other  # simulate a System built on another vocab
        with pytest.raises(ValueError, match="different vocabulary"):
            sys3.load_atlas(path)
