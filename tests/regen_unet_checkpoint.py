"""Regenerate the shipped prostate-ADC U-Net checkpoint.

Trains the compact :class:`convexadam_tpu.models.UNet3D` on the real
prostate MRI from the reference snapshot
(/root/reference/tests/input/10000/): ADC image + prostate segmentation
(resampled onto the ADC grid through this repo's geometry stack, exactly
as in regen_real_anatomy.load_reference_pair).  The result is written to
``convexadam_tpu/models/checkpoints/unet3d_prostate_adc/`` (orbax params
+ meta.json) and loaded back via
``models.segmentation.load_pretrained_unet3d``.

This is deliberately a single-case overfit: its purpose is a *usable*,
reproducible checkpoint demonstrating the full raw-image → predicted
labels → semantic registration path with predictions that are imperfect
(pred != GT), the regime the reference's nnU-Net arm consumes from disk
(main_for_l2r3_nnUNet.py:76-80) — not a clinically trained model (the full
L2R training corpora are not available in this environment).

Foreground occupies only ~0.9% of the volume, so training uses the
nnU-Net foreground-oversampling rule (fg_fraction=0.5).

Usage:  python -m tests.regen_unet_checkpoint   (runs on any backend;
~2-5 min on CPU)
"""

import json
import pathlib

import numpy as np

CHANNELS = (8, 16, 32)
PATCH = (64, 64, 28)  # dims must be multiples of 4 (two stride-2 levels)
STEPS = 600
SEED = 0

_OUT = (
    pathlib.Path(__file__).parent.parent
    / "convexadam_tpu"
    / "models"
    / "checkpoints"
    / "unet3d_prostate_adc"
)


def main():
    from convexadam_tpu.models.segmentation import save_unet3d, train_unet3d

    from tests.regen_real_anatomy import load_reference_pair

    adc, _, seg = load_reference_pair()
    img = (adc - adc.mean()) / adc.std()
    lab = (seg > 0.5).astype(np.int32)

    params, history = train_unet3d(
        img[None],
        lab[None],
        num_classes=2,
        patch_size=PATCH,
        steps=STEPS,
        batch_size=2,
        channels=CHANNELS,
        seed=SEED,
        fg_fraction=0.5,
        verbose=True,
    )
    print(f"final loss: {history[-1]:.4f}")

    _OUT.mkdir(parents=True, exist_ok=True)
    save_unet3d(params, _OUT / "params")
    (_OUT / "meta.json").write_text(
        json.dumps(
            {
                "num_classes": 2,
                "channels": list(CHANNELS),
                "patch_size": list(PATCH),
                "normalization": "zscore",
                "trained_on": "reference snapshot 10000_1000000 ADC + prostate seg",
                "steps": STEPS,
                "seed": SEED,
            },
            indent=2,
        )
        + "\n"
    )
    print(f"wrote {_OUT}")


if __name__ == "__main__":
    main()
