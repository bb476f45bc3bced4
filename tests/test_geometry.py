"""Tests for the pure-numpy geometry subsystem (I/O, resampling, spaces)."""

import numpy as np
import pytest

from convexadam_tpu.geometry import (
    MedicalImage,
    read_image,
    resample_img,
    resample_moving_to_fixed,
    rescale_displacement_field,
    write_image,
)
from convexadam_tpu.geometry.io import (
    load_volume_nib_order,
    save_volume_nib_order,
)


def _rand_img(rng, shape=(8, 9, 10)):
    return MedicalImage(
        rng.standard_normal(shape).astype(np.float32),
        spacing=(1.5, 2.0, 2.5),
        origin=(3.0, -7.0, 11.0),
        direction=(0, 1, 0, -1, 0, 0, 0, 0, 1),  # 90° rotation
    )


def test_nifti_roundtrip(rng, tmp_path):
    img = _rand_img(rng)
    for name in ["a.nii", "b.nii.gz"]:
        p = tmp_path / name
        write_image(img, p)
        back = read_image(p)
        np.testing.assert_allclose(back.data, img.data, atol=1e-6)
        np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-5)
        np.testing.assert_allclose(back.origin, img.origin, atol=1e-4)
        np.testing.assert_allclose(
            back.direction_matrix, img.direction_matrix, atol=1e-5
        )


def test_mha_roundtrip(rng, tmp_path):
    img = _rand_img(rng)
    p = tmp_path / "a.mha"
    write_image(img, p)
    back = read_image(p)
    np.testing.assert_allclose(back.data, img.data, atol=1e-6)
    np.testing.assert_allclose(back.spacing, img.spacing, rtol=1e-6)
    np.testing.assert_allclose(back.origin, img.origin, atol=1e-6)
    np.testing.assert_allclose(back.direction_matrix, img.direction_matrix, atol=1e-6)


def test_mha_2d_promoted_to_single_slice(tmp_path):
    """A 2D MetaImage (NDims=2) must load as a (1, ny, nx) volume with the
    2x2 TransformMatrix embedded into the (x, y) block of the direction —
    neither a reshape crash nor a downstream unpacking crash."""
    hdr = (
        "ObjectType = Image\nNDims = 2\nDimSize = 4 3\n"
        "ElementType = MET_FLOAT\nTransformMatrix = 0 -1 1 0\n"
        "Offset = 5 6\nElementSpacing = 2 3\nElementDataFile = LOCAL\n"
    )
    body = np.arange(12, dtype=np.float32).tobytes()
    p = tmp_path / "slice2d.mha"
    p.write_bytes(hdr.encode() + body)
    img = read_image(p)
    assert img.data.shape == (1, 3, 4)
    np.testing.assert_allclose(img.data[0].ravel(), np.arange(12))
    assert img.spacing == (2.0, 3.0, 1.0) and img.origin == (5.0, 6.0, 0.0)
    dm = np.asarray(img.direction).reshape(3, 3)
    np.testing.assert_allclose(dm[:2, :2], [[0, 1], [-1, 0]])
    np.testing.assert_allclose(dm[2], [0, 0, 1])
    assert img.size == (4, 3, 1)  # (x, y, z) — downstream accessor works


def test_nifti_scl_slope_zero_means_no_scaling(rng, tmp_path):
    """NIfTI-1: scl_slope == 0 (a common 'unset' pattern) means NO scaling —
    the intercept must not be applied (nibabel semantics)."""
    import struct

    data = rng.standard_normal((5, 6, 7)).astype(np.float32)
    p = tmp_path / "raw.nii"
    save_volume_nib_order(data, np.eye(4), p)
    blob = bytearray(p.read_bytes())
    struct.pack_into("<f", blob, 112, 0.0)    # scl_slope = 0
    struct.pack_into("<f", blob, 116, 100.0)  # scl_inter = 100
    p.write_bytes(bytes(blob))
    back, _ = load_volume_nib_order(p)
    np.testing.assert_allclose(back, data, atol=1e-6)  # NOT shifted by 100
    # NaN slope likewise means unset
    struct.pack_into("<f", blob, 112, float("nan"))
    p.write_bytes(bytes(blob))
    back, _ = load_volume_nib_order(p)
    np.testing.assert_allclose(back, data, atol=1e-6)
    # a real slope/intercept IS applied
    struct.pack_into("<f", blob, 112, 2.0)
    p.write_bytes(bytes(blob))
    back, _ = load_volume_nib_order(p)
    np.testing.assert_allclose(back, data * 2.0 + 100.0, rtol=1e-6)


def test_nib_order_roundtrip(rng, tmp_path):
    data = rng.standard_normal((6, 7, 8, 3)).astype(np.float32)
    affine = np.array(
        [[2.0, 0, 0, 5.0], [0, 0, -1.5, 3.0], [0, 2.5, 0, -9.0], [0, 0, 0, 1]]
    )
    p = tmp_path / "disp.nii.gz"
    save_volume_nib_order(data, affine, p)
    back, back_affine = load_volume_nib_order(p)
    np.testing.assert_allclose(back, data, atol=1e-6)
    np.testing.assert_allclose(back_affine, affine, atol=1e-5)


def test_index_world_roundtrip(rng):
    img = _rand_img(rng)
    idx = rng.random((20, 3)) * 7
    w = img.index_to_world(idx)
    back = img.world_to_index(w)
    np.testing.assert_allclose(back, idx, atol=1e-9)


def test_resample_img_identity_spacing(rng):
    img = _rand_img(rng)
    out = resample_img(img, spacing=img.spacing)
    assert out.size == img.size
    np.testing.assert_allclose(out.data, img.data, atol=1e-4)


def test_resample_halving_spacing_doubles_size(rng):
    img = _rand_img(rng, (8, 8, 8))
    out = resample_img(img, spacing=tuple(s / 2 for s in img.spacing))
    assert out.size == tuple(2 * s for s in img.size)
    # downsample positions: out[::2] samples the original voxel centres
    np.testing.assert_allclose(out.data[::2, ::2, ::2], img.data, atol=1e-4)


def test_resample_moving_to_fixed_translation(rng):
    """A moving image that is a translated copy of fixed must land exactly on
    fixed's voxels after resampling onto fixed's grid."""
    fixed = MedicalImage(
        rng.standard_normal((10, 10, 10)).astype(np.float32),
        spacing=(2.0, 2.0, 2.0),
        origin=(0.0, 0.0, 0.0),
    )
    # moving: same data, origin shifted by exactly 2 voxels in x
    moving = MedicalImage(fixed.data.copy(), fixed.spacing, (4.0, 0.0, 0.0))
    out = resample_moving_to_fixed(fixed, moving)
    # moving occupies world x in [4, 22]; fixed grid x index i ↦ world 2i;
    # resampled(i) = moving at world 2i = fixed.data[..., i-2]
    np.testing.assert_allclose(out.data[:, :, 2:], fixed.data[:, :, :-2], atol=1e-5)
    np.testing.assert_allclose(out.data[:, :, :2], 0.0, atol=1e-6)


def test_rescale_displacement_field_identity_directions(rng):
    """With identical directions and spacing ratio 2, vectors double and the
    field is resampled onto the moving grid."""
    fixed_res = MedicalImage(
        np.zeros((8, 8, 8), np.float32), spacing=(2.0, 2.0, 2.0)
    )
    fixed = fixed_res
    moving = MedicalImage(np.zeros((16, 16, 16), np.float32), spacing=(1.0, 1.0, 1.0))
    field = np.tile(
        np.array([1.0, 2.0, 3.0], np.float32), (8, 8, 8, 1)
    )
    out = rescale_displacement_field(field, moving, fixed, fixed_res)
    assert out.shape == (16, 16, 16, 3)
    # interior voxels: constant field × spacing ratio 2
    np.testing.assert_allclose(
        out[4:-4, 4:-4, 4:-4],
        np.broadcast_to(np.array([2.0, 4.0, 6.0]), (8, 8, 8, 3)),
        atol=1e-5,
    )


def test_rescale_displacement_field_rotation():
    """A 90° direction mismatch must rotate the displacement vectors
    (convex_adam_utils.py:337-345)."""
    fixed_res = MedicalImage(np.zeros((6, 6, 6), np.float32))
    fixed = fixed_res
    moving = MedicalImage(
        np.zeros((6, 6, 6), np.float32),
        direction=(0, -1, 0, 1, 0, 0, 0, 0, 1),  # rot90 about z
    )
    field = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (6, 6, 6, 1))  # dx=1
    out = rescale_displacement_field(field, moving, fixed, fixed_res)
    # the rotated moving grid maps index (i,j,k) → world (−j, i, k): it
    # overlaps the fixed grid's world extent only on the j=0 plane
    R = moving.direction_matrix
    expected_xyz = np.array([1.0, 0, 0]) @ R  # (0, −1, 0)
    np.testing.assert_allclose(out[3, 0, 3][::-1], expected_xyz, atol=1e-5)
    # everything off the overlap plane resamples to zero
    assert np.all(out[:, 1:, :] == 0)


def test_translation_module_recovers_shift(rng):
    """Metamorphic: an origin-shifted copy must be recovered as a whole-voxel
    translation (reference tests/test_convex_adam_mind_translation.py:72-100)."""
    from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig
    from convexadam_tpu.pipeline.translation import convex_adam_translation

    # structured volume
    vol = rng.standard_normal((40, 40, 40)).astype(np.float32)
    from scipy.ndimage import uniform_filter

    vol = uniform_filter(vol, 3) * 100
    fixed = MedicalImage(vol, spacing=(1.0, 1.0, 1.0), origin=(0, 0, 0))
    moving = MedicalImage(vol.copy(), (1.0, 1.0, 1.0), origin=(6.0, -4.0, 3.0))

    cfg = ConvexAdamConfig(grid_sp=4, disp_hw=2, selected_niter=40, grid_sp_adam=2)
    translation_xyz, moved, _ = convex_adam_translation(fixed, moving, cfg=cfg)
    # the moved image's origin should be back to ~fixed's (within 1 voxel=1mm)
    np.testing.assert_allclose(moved.origin, (0.0, 0.0, 0.0), atol=1.0)


def test_identity_rotated_direction_cancels(rng):
    """Reference geometry test pattern (tests/test_convex_adam_mind.py:138-189):
    a moving image that is the fixed image physically rotated via direction
    cosines AND array-rotated to compensate must resample onto the fixed grid
    as the original — and register with a near-zero central field."""
    from scipy.ndimage import uniform_filter

    vol = uniform_filter(rng.standard_normal((40, 40, 40)).astype(np.float32), 2) * 100
    fixed = MedicalImage(vol, spacing=(1.0, 1.0, 1.0), origin=(0, 0, 0))

    # rotate the array 90° about the z axis: rot[z, y', x'] = vol[z, N-1-x', y']
    # → voxel (i', j', k') holds the sample at world (j', N-1-i', k'), so the
    # direction/origin below make index→world land exactly on those points
    rot_data = np.rot90(vol, k=1, axes=(2, 1)).copy()  # (z, y, x) array
    moving = MedicalImage(
        rot_data,
        spacing=(1.0, 1.0, 1.0),
        origin=(0.0, 39.0, 0.0),
        direction=(0, 1, 0, -1, 0, 0, 0, 0, 1),
    )
    back = resample_moving_to_fixed(fixed, moving)
    # interior must reproduce the original (border voxel may hit padding)
    np.testing.assert_allclose(
        back.data[2:-2, 2:-2, 2:-2], vol[2:-2, 2:-2, 2:-2], atol=1e-3
    )

    from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam

    cfg = ConvexAdamConfig(grid_sp=4, disp_hw=2, selected_niter=80, grid_sp_adam=2)
    disp = convex_adam(fixed.data, back.data, cfg)
    c = 10
    assert np.abs(disp[c:-c, c:-c, c:-c]).max() < 0.3  # reference atol 0.3
