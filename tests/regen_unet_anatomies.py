"""Regenerate the MULTI-ANATOMY U-Net checkpoint (VERDICT r4 next#7).

The multi-case checkpoint (unet3d_prostate_multi) varies deformation and
contrast of ONE subject; this one varies the ANATOMY itself: four
procedurally generated, structurally distinct anatomies (different blob
topologies — see :func:`make_anatomy`), three in training (each under
identity + two random deformations = 9 cases), the fourth NEVER seen.
``test_pretrained_anatomy_checkpoint_generalizes`` pins the held-out-anatomy
Dice — the nnU-Net-predictions regime the reference consumes
(main_for_l2r3_nnUNet.py:76-80) needs a segmenter that transfers to unseen
subjects, and without real multi-subject corpora in this environment,
topologically distinct synthetic anatomies are the strongest available
test of that transfer.

Usage:  python -m tests.regen_unet_anatomies
        (CPU by default; CONVEXADAM_REGEN_PLATFORM=axon trains on the chip
        in ~minutes.)
"""

import json
import os
import pathlib

import numpy as np

if __name__ == "__main__":
    _platform = os.environ.get("CONVEXADAM_REGEN_PLATFORM", "cpu")
    os.environ["JAX_PLATFORMS"] = _platform
    import jax

    jax.config.update("jax_platforms", _platform)

CHANNELS = (8, 16, 32)
PATCH = (64, 64, 28)
STEPS = 900
SEED = 0
SHAPE = (96, 96, 56)
TRAIN_ANATOMIES = ("ellipsoid_notch", "twin_blobs", "shell")
HOLDOUT_ANATOMY = "bent_tube"
TRAIN_DEFORM_SEEDS = (1, 2)
AMPLITUDE = 3.0

_OUT = (
    pathlib.Path(__file__).parent.parent
    / "convexadam_tpu"
    / "models"
    / "checkpoints"
    / "unet3d_anatomies"
)


def _grid(shape):
    return np.meshgrid(
        *(np.linspace(-1, 1, s, dtype=np.float32) for s in shape),
        indexing="ij",
    )


def make_anatomy(kind: str, shape=SHAPE) -> np.ndarray:
    """Binary label volume of one of four structurally DISTINCT anatomies:

    - ellipsoid_notch: one convex blob with a concave bite (simply
      connected, genus 0)
    - twin_blobs: two disjoint components of different size
    - shell: a thick spherical shell (hollow — a cavity the others lack)
    - bent_tube: a curved tube (elongated, bent medial axis) — HELD OUT
    """
    z, y, x = _grid(shape)
    if kind == "ellipsoid_notch":
        body = (z / 0.55) ** 2 + (y / 0.45) ** 2 + (x / 0.6) ** 2 < 1.0
        notch = ((z - 0.35) / 0.3) ** 2 + (y / 0.25) ** 2 + (
            (x - 0.3) / 0.35
        ) ** 2 < 1.0
        return (body & ~notch).astype(np.int32)
    if kind == "twin_blobs":
        b1 = ((z + 0.3) / 0.35) ** 2 + ((y + 0.25) / 0.3) ** 2 + (
            (x + 0.2) / 0.4
        ) ** 2 < 1.0
        b2 = ((z - 0.35) / 0.25) ** 2 + ((y - 0.3) / 0.22) ** 2 + (
            (x - 0.25) / 0.28
        ) ** 2 < 1.0
        return (b1 | b2).astype(np.int32)
    if kind == "shell":
        r2 = (z / 0.55) ** 2 + (y / 0.5) ** 2 + (x / 0.6) ** 2
        return ((r2 < 1.0) & (r2 > 0.45)).astype(np.int32)
    if kind == "bent_tube":
        # medial axis: x sweeps, (z, y) follow a bent parabola
        cz = 0.45 * x * x - 0.2
        cy = 0.35 * x
        rad2 = (z - cz) ** 2 + (y - cy) ** 2
        return ((rad2 < 0.06) & (np.abs(x) < 0.75)).astype(np.int32)
    raise ValueError(kind)


def synthesize_image(lab: np.ndarray, seed: int) -> np.ndarray:
    """MRI-like intensity from a label volume: bright foreground over a
    textured background, smooth bias field, boundary blur, Rician-ish
    noise — enough nuisance that thresholding alone fails but the mapping
    stays learnable."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    shape = lab.shape
    fg = gaussian_filter(lab.astype(np.float32), 1.5)  # soft boundary
    texture = gaussian_filter(
        rng.standard_normal(shape).astype(np.float32), 2.0
    )
    bias = gaussian_filter(
        rng.standard_normal(shape).astype(np.float32), 16.0
    )
    bias = bias / (np.abs(bias).max() + 1e-6)
    img = 1.6 * fg + 0.7 * texture + 0.8 * bias
    img = img + 0.15 * rng.standard_normal(shape).astype(np.float32)
    return ((img - img.mean()) / img.std()).astype(np.float32)


def make_case(kind: str, deform_seed: "int | None", image_seed: int):
    """One (image, label) case: anatomy ``kind``, optionally deformed by a
    smooth random field (same augmentation as regen_unet_multicase)."""
    lab = make_anatomy(kind)
    if deform_seed is not None:
        from tests.regen_unet_multicase import make_deformed_case

        # deform the LABEL first, then synthesize intensity on the warped
        # labels (a fresh texture per case — deformation and texture vary
        # independently)
        _, lab = make_deformed_case(
            lab.astype(np.float32), lab, deform_seed, amplitude=AMPLITUDE
        )
    return synthesize_image(lab, image_seed), lab


def build_cases():
    images, labels = [], []
    img_seed = 100
    for kind in TRAIN_ANATOMIES:
        for dseed in (None,) + tuple(TRAIN_DEFORM_SEEDS):
            img, lab = make_case(kind, dseed, img_seed)
            images.append(img)
            labels.append(lab)
            img_seed += 1
    return np.stack(images), np.stack(labels)


def holdout_case():
    """The held-out anatomy (never trained), fresh texture seed."""
    return make_case(HOLDOUT_ANATOMY, None, 999)


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
    print(f"training on {len(images)} cases {images.shape[1:]} "
          f"(anatomies: {TRAIN_ANATOMIES})")
    params, history = train_unet3d(
        images, labels, num_classes=2, patch_size=PATCH, steps=STEPS,
        batch_size=2, channels=CHANNELS, seed=SEED, fg_fraction=0.5,
        verbose=True,
    )
    print(f"final loss: {history[-1]:.4f}")

    predictor = make_predictor(params, num_classes=2, channels=CHANNELS)
    img, gt = holdout_case()
    pred = sliding_window_predict(predictor, img, PATCH)
    d = float(_dice(pred, gt))
    print(f"HELD-OUT anatomy ({HOLDOUT_ANATOMY}): dice {d:.4f}")

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
                    f"synthetic anatomies {list(TRAIN_ANATOMIES)} x "
                    f"{{identity + deform seeds {list(TRAIN_DEFORM_SEEDS)}}}"
                    " (9 cases)"
                ),
                "holdout_anatomy": HOLDOUT_ANATOMY,
                "holdout_dice": round(d, 4),
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
