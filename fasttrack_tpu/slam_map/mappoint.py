"""MapPoint: a 3D landmark (src/MapPoint.cc, include/MapPoint.h).

Carries world position, viewing normal, a distinctive descriptor, the
observation map {keyframe_id -> feature index}, scale-invariance distances
and the visible/found counters used by MapPointCulling
(LocalMapping.cc:346).
"""

from __future__ import annotations

import numpy as np


class MapPoint:
    __slots__ = (
        "mid", "position", "normal", "desc_packed", "desc_signed",
        "observations", "ref_kf_id", "min_distance", "max_distance",
        "n_visible", "n_found", "bad", "first_kf_id", "replaced_by",
        "track_in_view", "track_proj_uv", "track_level", "track_view_cos",
        "last_frame_seen",
    )

    def __init__(self, mid: int, position: np.ndarray, ref_kf_id: int, first_kf_id: int):
        self.mid = mid
        self.position = np.asarray(position, dtype=np.float64)
        self.normal = np.zeros(3, dtype=np.float64)
        self.desc_packed = None   # (32,) uint8
        self.desc_signed = None   # (256,) int8
        self.observations: dict[int, int] = {}
        self.ref_kf_id = ref_kf_id
        self.first_kf_id = first_kf_id
        self.min_distance = 0.0
        self.max_distance = np.inf
        self.n_visible = 1
        self.n_found = 1
        self.bad = False
        self.replaced_by: int | None = None
        # per-frame tracking cache (MapPoint.h mbTrackInView etc.)
        self.track_in_view = False
        self.track_proj_uv = np.zeros(2)
        self.track_level = 0
        self.track_view_cos = 1.0
        self.last_frame_seen = -1

    def n_obs(self) -> int:
        return len(self.observations)

    def add_observation(self, kf_id: int, idx: int):
        self.observations[kf_id] = idx

    def erase_observation(self, kf_id: int) -> bool:
        """Returns True if the point became bad (<=2 observations left after
        losing its anchor, MapPoint::EraseObservation semantics)."""
        self.observations.pop(kf_id, None)
        if self.ref_kf_id == kf_id and self.observations:
            self.ref_kf_id = next(iter(self.observations))
        if len(self.observations) <= 1:
            self.bad = True
        return self.bad

    def found_ratio(self) -> float:
        return self.n_found / max(self.n_visible, 1)

    def update_descriptor(self, descs_packed: np.ndarray, descs_signed: np.ndarray):
        """Pick the descriptor with minimum median Hamming distance to the
        others (MapPoint::ComputeDistinctiveDescriptors)."""
        n = len(descs_packed)
        if n == 0:
            return
        if n == 1:
            self.desc_packed = descs_packed[0]
            self.desc_signed = descs_signed[0]
            return
        s = descs_signed.astype(np.int32)
        dots = s @ s.T
        ham = (256 - dots) // 2
        med = np.median(ham, axis=1)
        k = int(np.argmin(med))
        self.desc_packed = descs_packed[k]
        self.desc_signed = descs_signed[k]

    def update_normal_and_depth(self, kf_positions: dict[int, np.ndarray],
                                ref_kf_pos: np.ndarray, ref_level: int,
                                scale_factor: float, n_levels: int):
        """MapPoint::UpdateNormalAndDepth: mean viewing direction + scale
        invariance distance band from the reference keyframe."""
        if not self.observations:
            return
        dirs = []
        for kf_id, pos in kf_positions.items():
            v = self.position - pos
            n = np.linalg.norm(v)
            if n > 1e-9:
                dirs.append(v / n)
        if dirs:
            nrm = np.mean(dirs, axis=0)
            nn = np.linalg.norm(nrm)
            if nn > 1e-9:
                self.normal = nrm / nn
        dist = np.linalg.norm(self.position - ref_kf_pos)
        level_factor = scale_factor**ref_level
        self.max_distance = dist * level_factor
        self.min_distance = self.max_distance / (scale_factor ** (n_levels - 1))

    def predict_scale(self, dist: float, scale_factor: float, n_levels: int) -> int:
        """MapPoint::PredictScale."""
        if dist < 1e-9:
            return 0
        ratio = self.max_distance / dist
        level = int(np.ceil(np.log(max(ratio, 1e-9)) / np.log(scale_factor)))
        return int(np.clip(level, 0, n_levels - 1))
