"""Atlas: multi-map manager (src/Atlas.cc).

Creates a fresh map when tracking is irrecoverably lost
(Tracking::CreateMapInAtlas); old maps stay for later merge by loop closing.
"""

from __future__ import annotations

from fasttrack_tpu.slam_map.map import Map


class Atlas:
    def __init__(self):
        self._maps: list[Map] = []
        self._next_map_id = 0
        self._next_kf_id = 0
        self._next_mp_id = 0
        self.cameras: list = []
        self.current: Map = self.create_new_map()

    def create_new_map(self) -> Map:
        m = Map(self._next_map_id)
        m.init_kf_id = self._next_kf_id
        self._next_map_id += 1
        self._maps.append(m)
        self.current = m
        return m

    def change_map(self, m: Map):
        self.current = m

    def next_kf_id(self) -> int:
        i = self._next_kf_id
        self._next_kf_id += 1
        return i

    def next_mp_id(self) -> int:
        i = self._next_mp_id
        self._next_mp_id += 1
        return i

    def add_camera(self, cam):
        if cam not in self.cameras:
            self.cameras.append(cam)
        return cam

    @property
    def maps(self) -> list[Map]:
        return [m for m in self._maps]

    def n_maps(self) -> int:
        return len(self._maps)

    def remove_map(self, m: Map):
        self._maps.remove(m)
