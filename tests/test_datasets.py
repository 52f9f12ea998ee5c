"""Dataset loader format parsing on synthetic directory trees
(the reference's Examples/*/ LoadImages/LoadIMU code paths)."""

import os

import numpy as np
import pytest
from PIL import Image

from fasttrack_tpu.datasets.loaders import (
    EurocSequence,
    KittiSequence,
    TumRgbdSequence,
    TumViSequence,
)


def write_png(path, value=100, size=(12, 16), dtype=np.uint8):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full((size[0], size[1]), value, dtype)
    Image.fromarray(arr).save(path)


def make_euroc(root, n=3, with_imu=True):
    stamps = [1403636579763555584 + int(5e7) * i for i in range(n)]
    for s in stamps:
        write_png(os.path.join(root, "mav0", "cam0", "data", f"{s}.png"), 90)
        write_png(os.path.join(root, "mav0", "cam1", "data", f"{s}.png"), 110)
    if with_imu:
        imu = os.path.join(root, "mav0", "imu0", "data.csv")
        os.makedirs(os.path.dirname(imu), exist_ok=True)
        with open(imu, "w") as f:
            f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
            t0 = stamps[0] - int(1e7)
            for k in range(n * 10):
                f.write(f"{t0 + int(5e6) * k},0.01,0.02,0.03,0.1,0.2,9.8\n")
    return stamps


class TestEuroc:
    def test_loads_layout_and_imu(self, tmp_path):
        stamps = make_euroc(str(tmp_path), n=3)
        seq = EurocSequence(str(tmp_path))
        assert len(seq) == 3
        t, left, right = seq[0]
        assert abs(t - stamps[0] * 1e-9) < 1e-6
        assert left.shape == (12, 16) and float(left.mean()) == 90.0
        assert float(right.mean()) == 110.0
        assert seq.imu is not None
        samples = seq.imu.between(0, 1e18)
        assert len(samples) == 30
        t0, acc0, gyro0 = samples[0]  # grab_imu's (t, acc, gyro) order
        assert acc0[2] == 9.8 and gyro0[0] == 0.01

    def test_timestamps_file_subset(self, tmp_path):
        stamps = make_euroc(str(tmp_path), n=3)
        ts_file = str(tmp_path / "ts.txt")
        with open(ts_file, "w") as f:
            f.write(f"{stamps[1]}\n")
        seq = EurocSequence(str(tmp_path), timestamps_file=ts_file)
        assert len(seq) == 1
        assert abs(seq.timestamps[0] - stamps[1] * 1e-9) < 1e-6


class TestTumVi:
    def test_mav0_layout(self, tmp_path):
        make_euroc(str(tmp_path), n=2, with_imu=True)
        seq = TumViSequence(str(tmp_path))
        assert len(seq) == 2 and seq.imu is not None


class TestKitti:
    def test_times_and_images(self, tmp_path):
        root = str(tmp_path)
        with open(os.path.join(root, "times.txt"), "w") as f:
            for i in range(3):
                f.write(f"{0.1 * i:.6e}\n")
        for i in range(3):
            write_png(os.path.join(root, "image_0", f"{i:06d}.png"), 70)
            write_png(os.path.join(root, "image_1", f"{i:06d}.png"), 80)
        seq = KittiSequence(root)
        assert len(seq) == 3
        t, l, r = seq[2]
        assert abs(t - 0.2) < 1e-9
        assert float(l.mean()) == 70.0 and float(r.mean()) == 80.0


class TestTumRgbd:
    def test_association_by_nearest_timestamp(self, tmp_path):
        root = str(tmp_path)
        write_png(os.path.join(root, "rgb", "a.png"), 60)
        write_png(os.path.join(root, "rgb", "b.png"), 61)
        write_png(os.path.join(root, "depth", "a.png"), 5000, dtype=np.uint16)
        with open(os.path.join(root, "rgb.txt"), "w") as f:
            f.write("# comment\n1.000 rgb/a.png\n2.000 rgb/b.png\n")
        with open(os.path.join(root, "depth.txt"), "w") as f:
            f.write("1.005 depth/a.png\n")  # within max_dt of rgb a only
        seq = TumRgbdSequence(root)
        assert len(seq) == 1  # rgb b has no depth within 20 ms
        t, rgb, depth = seq[0]
        assert abs(t - 1.0) < 1e-9
        assert float(rgb.mean()) == 60.0
        assert np.allclose(depth, 1.0)  # 5000 / depth_factor(5000)
