"""fasttrack_tpu — a TPU-native visual-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
sfu-rsl/FastTrack (a GPU-accelerated ORB-SLAM3 fork):

- ORB feature extraction (pyramid resize/blur, FAST, IC-angle, rotated BRIEF)
  as batched XLA/Pallas kernels over a padded level tensor.
- Rectified-stereo / fisheye descriptor matching and map-point
  search-by-projection as masked Hamming-distance kernels that ride the MXU
  (descriptors as signed-bit vectors, Hamming distance = matmul).
- Pose optimization / local & inertial bundle adjustment as a JAX
  Levenberg-Marquardt solver with Schur-complement reduction.
- Tracking / LocalMapping / LoopClosing pipeline with a multi-map Atlas,
  IMU preintegration, per-stage offload toggles and timing stats.
- EuRoC / TUM-VI / KITTI / TUM RGB-D dataset drivers and ATE evaluation.

The reference implementation is studied (not copied) from /root/reference;
docstrings cite reference files as `File.cc:line` for parity checking.
"""

__version__ = "0.1.0"

from fasttrack_tpu.kernels import KernelConfig, Stage  # noqa: F401
