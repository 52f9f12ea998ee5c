"""Dataset drivers: EuRoC, TUM-VI, KITTI, TUM RGB-D + synthetic renderer.

Mirror the reference example loaders (Examples/Stereo-Inertial/
stereo_inertial_euroc.cc LoadImages/LoadIMU etc.): each returns lazily
image-loading sequence objects with timestamps and (where available) IMU
streams.
"""

from fasttrack_tpu.datasets.loaders import (  # noqa: F401
    EurocSequence,
    TumViSequence,
    KittiSequence,
    TumRgbdSequence,
    load_image,
)
from fasttrack_tpu.datasets.synthetic import generate_sequence  # noqa: F401
