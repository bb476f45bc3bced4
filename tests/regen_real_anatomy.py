"""Regenerate the real-anatomy cross-implementation parity fixture.

Runs the UNMODIFIED reference implementation
(src/convexAdam/convex_adam_MIND.py:convex_adam_pt, torch CPU, float32) on
the real prostate MRI shipped in the reference snapshot
(/root/reference/tests/input/10000/): ADC (fixed) ← HBV (moving), both on
the same 116x114x31 grid at 1.75x1.75x3.3 mm, loaded in nibabel (i, j, k)
order through this repo's own MHA parser.  Stores the reference field as
``tests/reference_real_adc_hbv.npz``.

nibabel / SimpleITK are not installed in this environment; the reference
only touches them at import time for type annotations and in file-level
wrappers we do not call, so minimal module stubs suffice.

Usage:  python -m tests.regen_real_anatomy
"""

import pathlib
import sys
import types

import numpy as np

_HERE = pathlib.Path(__file__).parent
_REF_INPUT = pathlib.Path("/root/reference/tests/input/10000")


def _stub_module(name: str, **attrs) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _NeverAnImage:
    """Placeholder for sitk.Image / nib.Nifti1Image in isinstance checks."""


def load_reference_pair():
    """(adc, hbv, seg_on_adc_grid) in nibabel (i, j, k) order, float32."""
    from convexadam_tpu.geometry.io import read_image
    from convexadam_tpu.geometry.resample import resample_moving_to_fixed

    adc_img = read_image(_REF_INPUT / "10000_1000000_adc.mha")
    hbv_img = read_image(_REF_INPUT / "10000_1000000_hbv.mha")
    seg_img = read_image(_REF_INPUT / "10000_1000000_prostate_seg.nii.gz")
    # the segmentation lives on the (missing) T2w grid — resample it onto
    # the ADC grid (nearest) before use
    seg_on_adc = resample_moving_to_fixed(adc_img, seg_img, order=0)

    def nib_order(img):
        return np.ascontiguousarray(
            img.data.transpose(2, 1, 0).astype(np.float32)
        )

    return nib_order(adc_img), nib_order(hbv_img), nib_order(seg_on_adc)


def run_reference(fixed: np.ndarray, moving: np.ndarray, **kw) -> np.ndarray:
    _stub_module("nibabel", Nifti1Image=_NeverAnImage)
    _stub_module("SimpleITK", Image=_NeverAnImage)
    sys.path.insert(0, "/root/reference/src")
    import torch

    from convexAdam.convex_adam_MIND import convex_adam_pt

    return np.asarray(
        convex_adam_pt(
            torch.from_numpy(fixed).float(),
            torch.from_numpy(moving).float(),
            dtype=torch.float32,
            **kw,
        ),
        np.float32,
    )


def main():
    adc, hbv, seg = load_reference_pair()
    disp = run_reference(adc, hbv)
    # convex-stage-only field (lambda_weight=0 skips the Adam loop entirely,
    # convex_adam_MIND.py:147): pins the deterministic half of the pipeline
    # bitwise (measured cross-impl EPE == 0.0 on this pair at generation)
    disp_convex = run_reference(adc, hbv, lambda_weight=0.0)
    np.savez_compressed(
        _HERE / "reference_real_adc_hbv.npz",
        disp=disp.astype(np.float32),
        disp_convex=disp_convex.astype(np.float32),
        adc_sum=np.float64(adc.sum()),
        hbv_sum=np.float64(hbv.sum()),
        seg_sum=np.float64(seg.sum()),
    )
    print("saved", disp.shape, "field; |disp| p50/p95/max =",
          *np.percentile(np.sqrt((disp ** 2).sum(-1)), [50, 95, 100]).round(3))


if __name__ == "__main__":
    main()
