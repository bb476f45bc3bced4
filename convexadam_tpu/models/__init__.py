from convexadam_tpu.models.segmentation import (
    UNet3D,
    sliding_window_predict,
)

__all__ = ["UNet3D", "sliding_window_predict"]
