"""Geometry-aware host-side subsystem: medical image I/O (NIfTI-1 and
MetaImage, pure numpy — no nibabel/SimpleITK dependency), spacing/direction
resampling, and displacement-field space conversions.

Replaces the reference's nibabel/SimpleITK usage
(src/convexAdam/convex_adam_utils.py:282-351, apply_convex.py,
convex_adam_translation.py) with a dependency-free implementation that
follows SimpleITK's conventions: arrays are (z, y, x); spacing/origin/
direction are (x, y, z)-ordered; world frame is LPS.
"""

from convexadam_tpu.geometry.image import MedicalImage  # noqa: F401
from convexadam_tpu.geometry.io import read_image, write_image  # noqa: F401
from convexadam_tpu.geometry.resample import (  # noqa: F401
    resample_img,
    resample_moving_to_fixed,
)
from convexadam_tpu.geometry.displacement import (  # noqa: F401
    rescale_displacement_field,
)
