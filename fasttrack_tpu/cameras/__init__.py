"""Camera models (the reference's include/CameraModels/, re-designed).

Functional, batched, jit-safe. A camera is a small NamedTuple of intrinsics
plus a `kind` tag; `project` / `unproject` dispatch statically on the kind so
everything stays shape-stable under jit.
"""

from fasttrack_tpu.cameras.models import (  # noqa: F401
    Camera,
    PINHOLE,
    FISHEYE_KB8,
    make_pinhole,
    make_kannala_brandt8,
    project,
    project_point,
    unproject,
    project_jacobian,
    uncertainty2,
)
from fasttrack_tpu.cameras.stereo import (  # noqa: F401
    StereoRig,
    make_rectified_rig,
    triangulate_matches,
)
