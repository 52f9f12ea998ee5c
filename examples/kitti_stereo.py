#!/usr/bin/env python3
"""KITTI odometry stereo driver, mirroring Examples/Stereo/stereo_kitti.cc:
rectified stereo, KITTI-format trajectory out (one 3x4 pose per line).

Usage:
  python examples/kitti_stereo.py SETTINGS.yaml SEQ_DIR \
      [--mode 1111] [--po 1] [--out results/]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("sequence")
    ap.add_argument("--mode", default="1111")
    ap.add_argument("--po", type=int, default=1)
    ap.add_argument("--out", default="results")
    ap.add_argument("--gt", default=None,
                    help="ground-truth trajectory (EuRoC CSV or TUM "
                         "format) for ATE evaluation")
    ap.add_argument("--async-mapping", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.fasttrack_jax_cache"))

    from fasttrack_tpu.datasets import KittiSequence
    from fasttrack_tpu.kernels import KernelConfig
    from fasttrack_tpu.settings import load_settings
    from fasttrack_tpu.system import Sensor, System

    settings = load_settings(args.settings)
    seq = KittiSequence(args.sequence)
    kcfg = KernelConfig.from_bitmask(args.mode, pose_optimization=bool(args.po))
    system = System(settings, Sensor.STEREO, kernel_config=kcfg,
                    async_mapping=args.async_mapping)

    t0 = time.perf_counter()
    for i in range(len(seq)):
        ts, left, right = seq[i]
        system.track_stereo(left, right, ts)
        if i % 100 == 0:
            print(f"frame {i}/{len(seq)} state={system.tracking_state.name}")
    wall = time.perf_counter() - t0
    system.shutdown()

    os.makedirs(args.out, exist_ok=True)
    system.save_trajectory_kitti(os.path.join(args.out, "f_traj_kitti.txt"))
    system.save_keyframe_trajectory_tum(os.path.join(args.out, "kf_traj.txt"))
    system.save_stats(args.out)
    print(f"done: {len(seq)} frames in {wall:.1f}s "
          f"({system.stats.mean('tracking_total'):.2f} ms/frame tracking)")
    if args.gt:
        from fasttrack_tpu.evaluation import report_ate

        report_ate(system, args.gt, args.out, with_scale=False)


if __name__ == "__main__":
    main()
