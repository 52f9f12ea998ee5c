"""Driver-script smoke tests: render a short synthetic sequence to disk in
each dataset's on-disk layout (EuRoC / KITTI / TUM RGB-D), write a matching
File.version-1.0 settings YAML, and run each example driver end-to-end —
the reference ships one executable per dataset x sensor
(Examples/ + CMakeLists.txt:176-...)."""

import os
import runpy
import sys

import numpy as np
import pytest
from PIL import Image

from fasttrack_tpu.datasets.synthetic import generate_sequence

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.fixture(scope="module")
def seq():
    return generate_sequence(n_frames=12, h=240, w=320, seed=3)


def write_settings(path, seq, extra=""):
    fx = 0.8 * 320
    with open(path, "w") as f:
        f.write(f"""%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {fx}
Camera1.fy: {fx}
Camera1.cx: 160.0
Camera1.cy: 120.0
Camera.width: 320
Camera.height: 240
Camera.fps: 20.0
Camera.RGB: 1
Stereo.ThDepth: 60.0
Stereo.b: {seq.baseline}
ORBextractor.nFeatures: 512
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
{extra}
""")


def save_gray(path, img):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(path)


def run_driver(script, argv):
    old = sys.argv
    sys.argv = [script] + argv
    try:
        runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")
    finally:
        sys.argv = old


def assert_traj(path, min_rows=6):
    assert os.path.exists(path), path
    with open(path) as f:
        rows = [ln for ln in f if ln.strip()]
    assert len(rows) >= min_rows, (path, len(rows))


class TestDrivers:
    def test_mono_euroc(self, seq, tmp_path):
        root = tmp_path / "euroc"
        stamps = []
        for fr in seq.frames:
            ns = int(fr.timestamp * 1e9) + 1403636579763555584
            stamps.append(ns)
            save_gray(str(root / "mav0" / "cam0" / "data" / f"{ns}.png"), fr.left)
            save_gray(str(root / "mav0" / "cam1" / "data" / f"{ns}.png"), fr.right)
        yaml = str(tmp_path / "s.yaml")
        write_settings(yaml, seq)
        out = str(tmp_path / "out")
        run_driver("mono_euroc.py", [yaml, str(root), "--out", out])
        # mono on 12 frames: initialization happens, trajectory is written
        assert os.path.exists(os.path.join(out, "f_traj.txt"))

    def test_stereo_euroc(self, seq, tmp_path):
        root = tmp_path / "euroc"
        for fr in seq.frames:
            ns = int(fr.timestamp * 1e9) + 1403636579763555584
            save_gray(str(root / "mav0" / "cam0" / "data" / f"{ns}.png"), fr.left)
            save_gray(str(root / "mav0" / "cam1" / "data" / f"{ns}.png"), fr.right)
        yaml = str(tmp_path / "s.yaml")
        write_settings(yaml, seq)
        out = str(tmp_path / "out")
        run_driver("stereo_euroc.py", [yaml, str(root), "--out", out])
        assert_traj(os.path.join(out, "f_traj.txt"))
        assert_traj(os.path.join(out, "f_traj_euroc.txt"))

    def test_kitti_stereo(self, seq, tmp_path):
        root = tmp_path / "kitti"
        os.makedirs(root, exist_ok=True)
        with open(root / "times.txt", "w") as f:
            for fr in seq.frames:
                f.write(f"{fr.timestamp:.6e}\n")
        for i, fr in enumerate(seq.frames):
            save_gray(str(root / "image_0" / f"{i:06d}.png"), fr.left)
            save_gray(str(root / "image_1" / f"{i:06d}.png"), fr.right)
        yaml = str(tmp_path / "s.yaml")
        write_settings(yaml, seq)
        out = str(tmp_path / "out")
        run_driver("kitti_stereo.py", [yaml, str(root), "--out", out])
        assert_traj(os.path.join(out, "f_traj_kitti.txt"))

    def test_tum_rgbd(self, seq, tmp_path):
        root = tmp_path / "tum"
        os.makedirs(root, exist_ok=True)
        # synthesize RGB-D: depth from the known plane distance is not
        # available per-pixel here, so render depth = plane_z constant;
        # enough for the driver path (extract, unproject, track)
        fx = 0.8 * 320
        rgb_lines, depth_lines = [], []
        for i, fr in enumerate(seq.frames):
            rgb_rel = f"rgb/{i:04d}.png"
            d_rel = f"depth/{i:04d}.png"
            save_gray(str(root / rgb_rel), fr.left)
            os.makedirs(str(root / "depth"), exist_ok=True)
            # plane at z=4 m in front of a nearly-static camera: constant
            # 4.0 m depth at factor 5000 -> 20000
            d = np.full(fr.left.shape, 20000, np.uint16)
            Image.fromarray(d).save(str(root / d_rel))
            rgb_lines.append(f"{fr.timestamp:.4f} {rgb_rel}")
            depth_lines.append(f"{fr.timestamp:.4f} {d_rel}")
        with open(root / "rgb.txt", "w") as f:
            f.write("\n".join(rgb_lines) + "\n")
        with open(root / "depth.txt", "w") as f:
            f.write("\n".join(depth_lines) + "\n")
        yaml = str(tmp_path / "s.yaml")
        write_settings(yaml, seq, extra=f"Camera.bf: {0.8 * 320 * seq.baseline}\n")
        out = str(tmp_path / "out")
        run_driver("tum_rgbd.py", [yaml, str(root), "--out", out])
        assert_traj(os.path.join(out, "f_traj.txt"))


TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


class TestAteGate:
    def test_stereo_euroc_with_gt(self, tmp_path):
        """The release-gate path (euroc_eval_examples.sh role): render a
        sequence to the EuRoC on-disk layout with its GT file, run the REAL
        driver with --gt, and check the printed/saved ATE."""
        import json

        root = str(tmp_path / "seq")
        run_driver_path(
            os.path.join(TOOLS, "render_euroc_synthetic.py"),
            [root, "--frames", "16", "--no-imu"],
        )
        assert os.path.exists(os.path.join(root, "gt.txt"))
        out = str(tmp_path / "out")
        run_driver("stereo_euroc.py", [
            os.path.join(root, "settings.yaml"), root,
            "--out", out, "--gt", os.path.join(root, "gt.txt"),
        ])
        ate_path = os.path.join(out, "ate.json")
        assert os.path.exists(ate_path)
        with open(ate_path) as f:
            ate = json.load(f)
        assert np.isfinite(ate["ate_rmse"])
        assert ate["ate_rmse"] < 0.10, ate  # cm-level on the easy scene
        assert ate["n_associated"] >= 10

    def test_stereo_inertial_euroc_with_gt(self, tmp_path):
        """The stereo-INERTIAL gate path (stereo_inertial_euroc.cc role):
        the rendered layout's settings.yaml carries the IMU block
        (IMU.T_b_c1 / noise / frequency, Settings.cc IMU.* keys), the
        EuRoC imu0/data.csv loads, and the driver's --imu path runs the
        IMU_STEREO sensor end-to-end with ATE."""
        import json

        from fasttrack_tpu.settings import load_settings

        root = str(tmp_path / "seq")
        run_driver_path(
            os.path.join(TOOLS, "render_euroc_synthetic.py"),
            [root, "--frames", "16"],
        )
        assert os.path.exists(os.path.join(root, "mav0", "imu0", "data.csv"))
        s = load_settings(os.path.join(root, "settings.yaml"))
        assert s.T_b_c1 is not None and s.T_b_c1.shape == (4, 4)
        np.testing.assert_allclose(s.T_b_c1, np.eye(4))
        assert s.imu_frequency == 200.0
        out = str(tmp_path / "out")
        run_driver("stereo_euroc.py", [
            os.path.join(root, "settings.yaml"), root, "--imu",
            "--out", out, "--gt", os.path.join(root, "gt.txt"),
        ])
        with open(os.path.join(out, "ate.json")) as f:
            ate = json.load(f)
        assert np.isfinite(ate["ate_rmse"])
        assert ate["ate_rmse"] < 0.10, ate
        assert ate["n_associated"] >= 10

    def test_gt_loader_formats(self, tmp_path):
        from fasttrack_tpu.evaluation import load_ground_truth

        euroc = tmp_path / "euroc_gt.txt"
        euroc.write_text(
            "#timestamp [ns],px,py,pz,qw,qx,qy,qz\n"
            "1403636580863555584.0,4.66,-1.84,0.78,1,0,0,0\n"
            "1403636580913555456.0,4.67,-1.85,0.79,1,0,0,0\n"
        )
        t, p = load_ground_truth(str(euroc))
        assert len(t) == 2 and p.shape == (2, 3)
        assert abs(t[0] - 1403636580.8635556) < 1e-3  # ns -> s
        tum = tmp_path / "tum_gt.txt"
        tum.write_text("# tum\n1.00 0.1 0.2 0.3 0 0 0 1\n1.05 0.2 0.3 0.4 0 0 0 1\n")
        t2, p2 = load_ground_truth(str(tum))
        assert len(t2) == 2 and abs(t2[1] - 1.05) < 1e-9
        np.testing.assert_allclose(p2[0], [0.1, 0.2, 0.3])


def run_driver_path(script_path, argv):
    old = sys.argv
    sys.argv = [script_path] + argv
    try:
        runpy.run_path(script_path, run_name="__main__")
    finally:
        sys.argv = old
