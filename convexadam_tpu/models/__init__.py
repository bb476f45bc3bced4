from convexadam_tpu.models.segmentation import (
    UNet3D,
    load_pretrained_unet3d,
    load_unet3d,
    make_predictor,
    save_unet3d,
    sliding_window_predict,
    train_unet3d,
)

__all__ = [
    "UNet3D",
    "load_pretrained_unet3d",
    "load_unet3d",
    "make_predictor",
    "save_unet3d",
    "sliding_window_predict",
    "train_unet3d",
]
