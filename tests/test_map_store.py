"""PointStore lifecycle: Map.clear must release packed rows (regression:
_reset_active_map left ghost rows alive, growing the store unboundedly and
resolving stale mids via rows_for)."""

import numpy as np

from fasttrack_tpu.slam_map import Atlas, KeyFrame, MapPoint


def make_kf(atlas, n=8):
    kid = atlas.next_kf_id()
    return KeyFrame(
        kid, kid, 0.0, np.eye(3), np.zeros(3),
        np.zeros((n, 2), np.float32), np.zeros(n, np.int32),
        np.zeros(n, np.float32), np.zeros((n, 32), np.uint8),
        np.zeros((n, 256), np.int8), np.full(n, -1.0, np.float32),
        np.full(n, -1.0, np.float32), np.ones(n, bool),
    )


class TestMapClear:
    def test_clear_releases_rows_and_mids(self):
        atlas = Atlas()
        m = atlas.current
        kf = make_kf(atlas)
        m.add_keyframe(kf)
        mids = []
        for i in range(8):
            mp = MapPoint(atlas.next_mp_id(), np.zeros(3), kf.kid, kf.kid)
            mp.desc_signed = np.ones(256, np.int8)
            mp.desc_packed = np.zeros(32, np.uint8)
            m.add_mappoint(mp)
            mids.append(mp.mid)
        assert m.store.alive.sum() == 8
        m.clear()
        assert not m.keyframes and not m.mappoints
        assert m.store.alive.sum() == 0
        assert (m.rows_for(np.asarray(mids)) == -1).all()
        # rows are reusable, not leaked: adding 8 new points reuses freed rows
        n_rows_before = m.store.n_rows
        for i in range(8):
            mp = MapPoint(atlas.next_mp_id(), np.zeros(3), kf.kid, kf.kid)
            m.add_mappoint(mp)
        assert m.store.n_rows == n_rows_before
