"""Regenerate the MULTI-CASE prostate U-Net checkpoint (VERDICT r3 next#7).

The round-3 checkpoint (unet3d_prostate_adc) was a single-volume overfit.
This one trains across genuinely distinct cases built from the two real
diffusion volumes in the reference snapshot (ADC + HBV, different contrasts
on one grid) under smooth random deformations — 10 training cases total —
and is evaluated on a HELD-OUT deformation (seed never trained) of each
contrast, proving the trainer generalizes across cases rather than
memorizing one volume.  The full L2R corpora are not available in this
environment; deformation-augmented real anatomy is the honest multi-case
stand-in (the reference itself consumes nnU-Net predictions from disk,
main_for_l2r3_nnUNet.py:76-80).

Usage:  python -m tests.regen_unet_multicase
        (CPU by default — tens of minutes on a single core; set
        CONVEXADAM_REGEN_PLATFORM=axon to train on the chip in ~minutes.
        The batch sampler is host-side numpy either way, so both
        platforms see the same patches; meta.json records which backend
        produced the shipped params.)
"""

import json
import os
import pathlib

import numpy as np

if __name__ == "__main__":
    # default to a deterministic CPU regen (the axon sitecustomize would
    # otherwise route through the remote TPU; env vars alone cannot force
    # CPU) — unless the caller explicitly picks a platform
    _platform = os.environ.get("CONVEXADAM_REGEN_PLATFORM", "cpu")
    os.environ["JAX_PLATFORMS"] = _platform
    import jax

    jax.config.update("jax_platforms", _platform)

CHANNELS = (8, 16, 32)
PATCH = (64, 64, 28)
STEPS = 900
SEED = 0
TRAIN_DEFORM_SEEDS = (1, 2, 3, 4)
HOLDOUT_DEFORM_SEED = 99
AMPLITUDE = 4.0  # voxels

_OUT = (
    pathlib.Path(__file__).parent.parent
    / "convexadam_tpu"
    / "models"
    / "checkpoints"
    / "unet3d_prostate_multi"
)


def make_deformed_case(img: np.ndarray, seg: np.ndarray, seed: int,
                       amplitude: float = AMPLITUDE):
    """Warp (img, seg) by a smooth random displacement field (coarse normal
    field upsampled trilinearly, ~``amplitude`` voxels RMS) — image linear,
    labels nearest, the standard deformation-augmentation pair."""
    import jax.numpy as jnp

    from convexadam_tpu.core.warp import resize_trilinear, warp_with_displacement

    shape = img.shape
    rng = np.random.default_rng(seed)
    coarse = rng.standard_normal((3,) + tuple(max(s // 16, 2) for s in shape))
    disp = resize_trilinear(
        jnp.asarray(coarse, jnp.float32), shape, align_corners=True
    ) * amplitude
    w_img = np.asarray(
        warp_with_displacement(jnp.asarray(img, jnp.float32)[None], disp)[0]
    )
    w_seg = np.asarray(
        warp_with_displacement(
            jnp.asarray(seg, jnp.float32)[None], disp, mode="nearest"
        )[0]
    ).round().astype(np.int32)
    return w_img, w_seg


def build_cases():
    """((N, H, W, D) images, (N, H, W, D) labels) training set: ADC + HBV,
    identity + four deformations each (10 cases)."""
    from tests.regen_real_anatomy import load_reference_pair

    adc, hbv, seg = load_reference_pair()
    lab = (seg > 0.5).astype(np.int32)
    vols = [(adc - adc.mean()) / adc.std(), (hbv - hbv.mean()) / hbv.std()]
    images, labels = [], []
    for v in vols:
        images.append(v.astype(np.float32))
        labels.append(lab)
        for s in TRAIN_DEFORM_SEEDS:
            wi, wl = make_deformed_case(v, lab, s)
            images.append(wi)
            labels.append(wl)
    return np.stack(images), np.stack(labels)


def holdout_cases():
    """Held-out (image, gt) pairs: the HOLDOUT deformation of each contrast
    (a deformation seed never seen in training)."""
    from tests.regen_real_anatomy import load_reference_pair

    adc, hbv, seg = load_reference_pair()
    lab = (seg > 0.5).astype(np.int32)
    out = []
    for v in (adc, hbv):
        vn = ((v - v.mean()) / v.std()).astype(np.float32)
        out.append(make_deformed_case(vn, lab, HOLDOUT_DEFORM_SEED))
    return out


def _dice(pred, gt):
    inter = np.sum((pred == 1) & (gt == 1))
    return 2 * inter / ((pred == 1).sum() + (gt == 1).sum() + 1e-8)


def main():
    from convexadam_tpu.models.segmentation import (
        make_predictor,
        save_unet3d,
        sliding_window_predict,
        train_unet3d,
    )

    images, labels = build_cases()
    print(f"training on {len(images)} cases {images.shape[1:]}")
    params, history = train_unet3d(
        images, labels, num_classes=2, patch_size=PATCH, steps=STEPS,
        batch_size=2, channels=CHANNELS, seed=SEED, fg_fraction=0.5,
        verbose=True,
    )
    print(f"final loss: {history[-1]:.4f}")

    predictor = make_predictor(params, num_classes=2, channels=CHANNELS)
    dices = []
    for name, (img, gt) in zip(("adc", "hbv"), holdout_cases()):
        pred = sliding_window_predict(predictor, img, PATCH)
        d = _dice(pred, gt)
        dices.append(round(float(d), 4))
        print(f"held-out deformation ({name}): dice {d:.4f}")

    _OUT.mkdir(parents=True, exist_ok=True)
    save_unet3d(params, _OUT / "params")
    (_OUT / "meta.json").write_text(
        json.dumps(
            {
                "num_classes": 2,
                "channels": list(CHANNELS),
                "patch_size": list(PATCH),
                "normalization": "zscore",
                "trained_on": (
                    "reference snapshot 10000_1000000 ADC+HBV x "
                    f"{{identity + deform seeds {list(TRAIN_DEFORM_SEEDS)}}}"
                    " (10 cases)"
                ),
                "holdout_deform_seed": HOLDOUT_DEFORM_SEED,
                "holdout_dice": dices,
                "steps": STEPS,
                "seed": SEED,
                "regen_platform": __import__("jax").default_backend(),
            },
            indent=2,
        )
        + "\n"
    )
    print(f"wrote {_OUT}")


if __name__ == "__main__":
    main()
