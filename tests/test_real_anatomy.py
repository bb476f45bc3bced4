"""Cross-implementation parity and behaviour on REAL anatomy.

Every other accuracy fixture in this suite is synthetic smoothed noise;
these tests run on the real prostate MRI shipped with the reference
snapshot (/root/reference/tests/input/10000/: ADC + HBV diffusion volumes
on a shared 116x114x31 grid, plus the prostate segmentation on the missing
T2w's 640x640x31 grid — resampled onto the ADC grid through this repo's
own geometry stack).

The stored fixture (tests/reference_real_adc_hbv.npz) holds displacement
fields produced by the UNMODIFIED reference (convex_adam_pt, torch CPU,
float32) — regeneration recipe: ``python -m tests.regen_real_anatomy``.

Measured at fixture generation (CPU backend):
* convex stage (lambda_weight=0): cross-implementation EPE == 0.0 exactly —
  the MIND -> cost volume -> coupled convex -> IC -> upsample path is
  bitwise identical to the reference on real tissue contrast.
* full pipeline (default config, 80 Adam iters): EPE p50 0.092 / p95 1.27
  voxels (the chaotic-Adam amplification envelope documented in
  test_reference_parity), warped-image SSIM 0.955, prostate-seg warp Dice
  0.967 between implementations.
"""

import pathlib

import numpy as np

import jax
import jax.numpy as jnp

from convexadam_tpu.core.metrics import dice_coeff, ssim3d
from convexadam_tpu.core.warp import warp_with_displacement
from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam_jax

from tests.regen_real_anatomy import load_reference_pair

_HERE = pathlib.Path(__file__).parent
_FIXTURE = _HERE / "reference_real_adc_hbv.npz"


def _load():
    ref = np.load(_FIXTURE)
    adc, hbv, seg = load_reference_pair()
    # guard that the inputs decoded by geometry/io are the ones the fixture
    # was generated from
    assert adc.sum() == ref["adc_sum"] and hbv.sum() == ref["hbv_sum"]
    assert seg.sum() == ref["seg_sum"] and seg.sum() > 0
    return ref, adc, hbv, seg


def test_real_convex_stage_matches_reference_exactly():
    """lambda_weight=0 skips the Adam loop (convex_adam_MIND.py:147): the
    deterministic half of the pipeline must agree with the unmodified
    reference to float32 exactness on real anatomy (measured EPE == 0.0 on
    CPU; the TPU MXU coupled-convex form has a documented ~1%-of-cells
    tie-break envelope, core/convex.py)."""
    ref, adc, hbv, _ = _load()
    ours = np.asarray(
        convex_adam_jax(
            jnp.asarray(adc), jnp.asarray(hbv),
            ConvexAdamConfig(lambda_weight=0.0, dtype="float32"),
        ),
        np.float32,
    )
    epe = np.sqrt(((ours - ref["disp_convex"].astype(np.float32)) ** 2).sum(-1))
    if jax.default_backend() == "cpu":
        # float-ulp agreement (measured max 3.6e-6 voxels under the suite's
        # 8-virtual-device CPU config, exact 0.0 in a plain CPU process)
        assert epe.max() < 1e-4, epe.max()
    else:
        # on the real chip the MXU coupled-convex cross-term accumulates in
        # bf16 (CLAUDE.md; core/convex.py docstring), shifting the
        # soft-coupled displacement by sub-voxel noise everywhere rather
        # than flipping rare argmin ties — measured on-chip: p50 1.8e-7,
        # p95 0.027, p99 0.062, max 0.114 voxels, frac>0.5 exactly 0
        assert np.percentile(epe, 95) < 0.1, np.percentile(epe, 95)
        assert epe.max() < 0.5, epe.max()


def test_real_full_pipeline_quality_parity():
    """Default-config end-to-end field vs the unmodified reference on real
    anatomy: pointwise agreement within the chaotic-Adam envelope, and
    equal registration quality (warped-image SSIM, prostate-seg Dice)."""
    ref, adc, hbv, seg = _load()
    ours = np.asarray(
        convex_adam_jax(
            jnp.asarray(adc), jnp.asarray(hbv), ConvexAdamConfig(dtype="float32")
        ),
        np.float32,
    )
    rd = ref["disp"].astype(np.float32)
    epe = np.sqrt(((ours - rd) ** 2).sum(-1))
    assert np.percentile(epe, 50) < 0.2, np.percentile(epe, 50)
    assert np.percentile(epe, 95) < 2.0, np.percentile(epe, 95)

    def warp(field, vol, mode="bilinear"):
        return warp_with_displacement(
            jnp.asarray(vol)[None], jnp.moveaxis(jnp.asarray(field), -1, 0),
            mode=mode,
        )[0]

    assert float(ssim3d(warp(ours, hbv), warp(rd, hbv))) > 0.93
    d = float(dice_coeff(warp(ours, seg, "nearest"), warp(rd, seg, "nearest"), 2)[0])
    assert d > 0.9, d


def test_real_translation_recovery():
    """The reference's own translation test replicated on available real
    data (tests/test_convex_adam_mind_translation.py:72-100 runs t2w<-t2w;
    the t2w blob is absent from the snapshot, so this runs adc<-adc with
    the prostate segmentation as the averaging mask): translate the moving
    image 10 mm along two image axes, recover it within 1 mm."""
    from convexadam_tpu.geometry.io import read_image
    from convexadam_tpu.geometry.resample import resample_moving_to_fixed
    from convexadam_tpu.pipeline.translation import (
        apply_translation,
        convex_adam_translation,
    )

    base = "/root/reference/tests/input/10000/10000_1000000_"
    fixed = read_image(base + "adc.mha")
    seg = read_image(base + "prostate_seg.nii.gz")

    translation = np.array([10.0, 10.0, 0.0])  # mm along image directions
    # translate_along_image_directions equivalent (sitk.Resample with a
    # TranslationTransform, reference test :14-32): shift the origin by the
    # world translation, then materialise on the original grid — content
    # moves by -translation
    shifted = apply_translation(fixed, translation_ijk=translation)
    moving = resample_moving_to_fixed(fixed, shifted)

    t_xyz, _, _ = convex_adam_translation(
        fixed, moving, segmentation=seg,
        cfg=ConvexAdamConfig(selected_niter=20, dtype="float32"),
    )
    np.testing.assert_allclose(-translation, np.asarray(t_xyz), atol=1.0)
