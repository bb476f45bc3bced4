"""Direct value tests of the sliding-window inference helpers against the
reference formulas (convex_adam_utils.py:196-265), plus the validate_volume
input adapters (convex_adam_utils.py:268-279)."""

import numpy as np
import pytest

from convexadam_tpu.utils.sliding_window import (
    compute_steps_for_sliding_window,
    create_nonzero_mask,
    crop_to_bbox,
    get_bbox_from_mask,
    get_gaussian,
)


def test_sliding_window_steps_values():
    # patch 64, image 128, 50% overlap: 3 windows at 0/32/64 per axis
    steps = compute_steps_for_sliding_window([64, 64, 64], [128, 128, 128], 0.5)
    assert steps == [[0, 32, 64]] * 3
    # patch == image: single window at 0
    assert compute_steps_for_sliding_window([64], [64], 0.5) == [[0]]
    # non-divisible: ceil((100-32)/16)+1 = 6 windows, spread over [0, 68]
    steps = compute_steps_for_sliding_window([32], [100], 0.5)[0]
    assert steps == [0, 14, 27, 41, 54, 68]
    assert steps[-1] + 32 == 100  # last window flush with the image edge
    # anisotropic patch/image
    steps = compute_steps_for_sliding_window([64, 32], [128, 100], 0.5)
    assert steps[0] == [0, 32, 64] and steps[1] == [0, 14, 27, 41, 54, 68]


def test_sliding_window_full_coverage():
    """Every voxel must be covered by at least one window."""
    patch, image = [48], [130]
    steps = compute_steps_for_sliding_window(patch, image, 0.5)[0]
    covered = np.zeros(image[0], bool)
    for s in steps:
        covered[s: s + patch[0]] = True
    assert covered.all()


def test_gaussian_importance_map():
    g = get_gaussian((32, 32, 32))
    assert g.shape == (32, 32, 32) and g.dtype == np.float32
    assert g.max() == 1.0
    assert g[16, 16, 16] == 1.0  # peak at the center voxel
    assert g.min() > 0  # zeros replaced by the smallest positive value
    # symmetric around the center along each axis
    np.testing.assert_allclose(g[15, 16, 16], g[17, 16, 16], rtol=1e-5)
    np.testing.assert_allclose(g[16, 10, 16], g[16, 22, 16], rtol=1e-5)


def test_nonzero_mask_fills_holes():
    data = np.zeros((2, 10, 10, 10), np.float32)
    data[0, 2:8, 2:8, 2:8] = 1.0
    data[0, 4:6, 4:6, 4:6] = 0.0  # interior hole
    data[1, 7:9, 7:9, 7:9] = 2.0  # second channel extends the mask
    mask = create_nonzero_mask(data)
    assert mask[5, 5, 5]  # hole filled
    assert mask[8, 8, 8]  # union over channels
    assert not mask[0, 0, 0]


def test_bbox_and_crop():
    mask = np.zeros((10, 12, 14), np.int32)
    mask[2:5, 3:9, 4:6] = 1
    bbox = get_bbox_from_mask(mask)
    assert bbox == [[2, 5], [3, 9], [4, 6]]
    img = np.arange(10 * 12 * 14).reshape(10, 12, 14).astype(np.float32)
    crop = crop_to_bbox(img, bbox)
    assert crop.shape == (3, 6, 2)
    np.testing.assert_array_equal(crop, img[2:5, 3:9, 4:6])


# ---------------------------------------------------------------------------
# validate_volume adapters
# ---------------------------------------------------------------------------

def test_validate_volume_nibabel_ducktype():
    from convexadam_tpu.pipeline.convex_adam import validate_volume

    class FakeNifti:
        def __init__(self, arr):
            self._arr = arr
            self.affine = np.eye(4)

        def get_fdata(self):
            return self._arr.astype(np.float64)

    arr = np.random.default_rng(0).random((4, 5, 6)).astype(np.float32)
    out = validate_volume(FakeNifti(arr))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, arr, atol=1e-6)


def test_validate_volume_sitk_ducktype():
    """A SimpleITK-style image is converted through GetArrayFromImage of the
    module that defines its class (zyx order, like the reference's branch)."""
    import sys
    import types

    from convexadam_tpu.pipeline.convex_adam import validate_volume

    mod = types.ModuleType("fake_sitk")

    class Image:
        def __init__(self, arr):
            self._arr = arr

    def GetArrayFromImage(img):
        return img._arr

    mod.Image = Image
    mod.GetArrayFromImage = GetArrayFromImage
    Image.__module__ = "fake_sitk"
    sys.modules["fake_sitk"] = mod
    try:
        arr = np.random.default_rng(1).random((3, 4, 5)).astype(np.float32)
        out = validate_volume(Image(arr))
        np.testing.assert_allclose(out, arr, atol=1e-6)
    finally:
        del sys.modules["fake_sitk"]


def test_validate_volume_torch_and_array():
    import torch

    from convexadam_tpu.pipeline.convex_adam import validate_volume

    arr = np.ones((2, 3, 4), np.float32)
    np.testing.assert_array_equal(validate_volume(arr), arr)
    np.testing.assert_array_equal(validate_volume(torch.from_numpy(arr)), arr)
    with pytest.raises(ValueError):
        validate_volume("not an image")
