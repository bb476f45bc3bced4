"""Reference-compatible API surface (convexadam_tpu.compat).

Pins that a reference user's call sites keep working: same signatures,
defaults, dtype objects, file conventions (convex_adam_MIND.py:64-248,
apply_convex.py:13-24).
"""

import numpy as np
import torch

import jax.numpy as jnp

from convexadam_tpu.compat import apply_convex, convex_adam, convex_adam_pt
from convexadam_tpu.geometry.io import load_volume_nib_order, save_volume_nib_order
from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig
from convexadam_tpu.pipeline.convex_adam import convex_adam as convex_adam_ours


def _pair(rng, shape=(24, 24, 24), shift=(2, -1, 1)):
    vol = rng.standard_normal(shape).astype(np.float32)
    t = torch.from_numpy(vol)[None, None]
    for _ in range(2):
        t = torch.nn.functional.avg_pool3d(t, 3, stride=1, padding=1)
    vol = t[0, 0].numpy()
    vol = (vol - vol.mean()) / vol.std() * 100
    return vol, np.roll(vol, shift, axis=(0, 1, 2))


def test_convex_adam_pt_matches_native_api(rng):
    """The compat wrapper must be a faithful adapter: identical field to the
    native ConvexAdamConfig call, float64 output like the reference."""
    vol, mov = _pair(rng)
    kw = dict(grid_sp=3, disp_hw=2, selected_niter=6, grid_sp_adam=2)
    d_compat = convex_adam_pt(vol, mov, dtype=torch.float32, **kw)
    assert d_compat.dtype == np.float64 and d_compat.shape == (24, 24, 24, 3)
    d_native = convex_adam_ours(
        vol, mov, ConvexAdamConfig(dtype="float32", **kw)
    )
    np.testing.assert_allclose(d_compat, d_native.astype(float), atol=1e-6)


def test_convex_adam_pt_accepts_torch_inputs_and_fp16_policy(rng):
    """torch tensors in; torch.float16 maps to the auto precision policy
    (f32 on CPU — the reference's own CPU fallback, convex_adam_MIND.py:89-91)."""
    vol, mov = _pair(rng)
    d = convex_adam_pt(
        torch.from_numpy(vol), torch.from_numpy(mov),
        grid_sp=3, disp_hw=2, selected_niter=4, dtype=torch.float16,
    )
    assert np.isfinite(d).all()


def test_dtype_map_bfloat16_not_shadowed_by_float16():
    """'float16' is a substring of 'torch.bfloat16' — an explicit bf16
    request must map to bfloat16, not the auto policy."""
    from convexadam_tpu.compat import _map_dtype

    assert _map_dtype(torch.bfloat16) == "bfloat16"
    assert _map_dtype("bfloat16") == "bfloat16"
    assert _map_dtype(torch.float16) == "auto"
    assert _map_dtype(torch.float32) == "float32"
    assert _map_dtype(None) == "auto"


def test_convex_adam_file_to_file(rng, tmp_path):
    """File-level compat: loads niftis, writes <result_path>/disp.nii.gz
    with the fixed affine (convex_adam_MIND.py:205-248)."""
    vol, mov = _pair(rng)
    affine = np.diag([1.0, 1.0, 2.0, 1.0])
    save_volume_nib_order(vol, affine, tmp_path / "f.nii.gz")
    save_volume_nib_order(mov, affine, tmp_path / "m.nii.gz")
    convex_adam(
        tmp_path / "f.nii.gz", tmp_path / "m.nii.gz",
        grid_sp=3, disp_hw=2, selected_niter=4,
        result_path=tmp_path / "out",
    )
    disp, aff = load_volume_nib_order(tmp_path / "out" / "disp.nii.gz")
    assert disp.shape == (24, 24, 24, 3)
    np.testing.assert_allclose(aff, affine)
    # the reference writes the float64 field convex_adam_pt returns
    # (convex_adam_MIND.py:246-248); the on-disk dtype must match
    import gzip as _gzip
    import struct as _struct
    raw = _gzip.decompress((tmp_path / "out" / "disp.nii.gz").read_bytes())
    assert _struct.unpack_from("<h", raw, 70)[0] == 64  # NIFTI DT_FLOAT64


def test_apply_convex_compat(rng):
    vol, mov = _pair(rng)
    disp = np.zeros((24, 24, 24, 3), np.float32)
    disp[..., 0] = 2.0
    warped = apply_convex(torch.from_numpy(disp), torch.from_numpy(mov))
    # shifting the sample points by +2 along axis 0 undoes a roll of +2
    np.testing.assert_allclose(
        warped[4:-4, 4:-4, 4:-4],
        np.roll(mov, -2, axis=0)[4:-4, 4:-4, 4:-4],
        atol=1e-3,
    )


def test_mask_infill_path(rng, tmp_path):
    """use_mask with mask files (the reference loads them via nibabel,
    convex_adam_MIND.py:94-97)."""
    vol, mov = _pair(rng)
    mask = np.zeros(vol.shape, np.float32)
    mask[4:20, 4:20, 4:20] = 1.0
    affine = np.eye(4)
    save_volume_nib_order(mask, affine, tmp_path / "mask.nii.gz")
    d = convex_adam_pt(
        vol, mov, grid_sp=3, disp_hw=2, selected_niter=4, use_mask=True,
        path_fixed_mask=tmp_path / "mask.nii.gz",
        path_moving_mask=tmp_path / "mask.nii.gz",
        dtype="float32",
    )
    assert np.isfinite(d).all()


def test_medical_image_sitk_ducktype_roundtrip():
    """from_sitk accepts any SimpleITK-shaped object (module-level
    GetArrayFromImage + GetSpacing/GetOrigin/GetDirection)."""
    import sys
    import types

    from convexadam_tpu.geometry.image import MedicalImage

    mod = types.ModuleType("fake_sitk_mod")

    class FakeImage:
        def __init__(self, arr):
            self._arr = arr

        def GetSpacing(self):
            return (1.0, 2.0, 3.0)

        def GetOrigin(self):
            return (-5.0, 0.0, 5.0)

        def GetDirection(self):
            return (1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0)

    FakeImage.__module__ = "fake_sitk_mod"
    mod.FakeImage = FakeImage
    mod.GetArrayFromImage = lambda im: im._arr
    sys.modules["fake_sitk_mod"] = mod

    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    mi = MedicalImage.from_sitk(FakeImage(arr))
    np.testing.assert_array_equal(mi.data, arr)
    assert mi.spacing == (1.0, 2.0, 3.0)
    assert mi.origin == (-5.0, 0.0, 5.0)


def test_convex_adam_translation_compat_medicalimage(rng):
    """The compat translation entry accepts MedicalImage directly and
    recovers a synthetic whole-voxel shift."""
    from convexadam_tpu.compat import convex_adam_translation
    from convexadam_tpu.geometry.image import MedicalImage

    vol, mov = _pair(rng, shape=(28, 28, 28), shift=(2, 0, 0))
    fixed = MedicalImage(vol)
    moving = MedicalImage(mov)
    t, moved, _ = convex_adam_translation(fixed, moving)
    assert isinstance(moved, MedicalImage)
    assert len(t) == 3 and all(np.isfinite(t))


def test_even_selected_smooth_rounds_up(rng):
    """Documented divergence: the reference warns on even selected_smooth
    and then applies the even kernel anyway (convex_adam_MIND.py:184-191,
    half-voxel drift per pass); we round up to the next odd kernel — an
    even request must produce EXACTLY the next-odd field."""
    vol, mov = _pair(rng)
    kw = dict(grid_sp=3, disp_hw=2, selected_niter=4)
    even = convex_adam_pt(vol, mov, selected_smooth=4, **kw)
    odd = convex_adam_pt(vol, mov, selected_smooth=5, **kw)
    np.testing.assert_array_equal(even, odd)
    unsmoothed = convex_adam_pt(vol, mov, selected_smooth=0, **kw)
    assert np.abs(even - unsmoothed).max() > 0
