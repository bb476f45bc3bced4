"""End-to-end tests of the composed challenge flows (reference root
scripts, SURVEY.md §2.4) on synthetic cases."""

import numpy as np
from scipy.ndimage import uniform_filter

from convexadam_tpu.pipeline.challenges import (
    Task1CaseMeta,
    curious_case,
    landmark_centroids,
    register_tps_densified,
    task1_field_to_original,
)
from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig


def _smooth_volume(shape, seed=0, scale=100.0):
    rng = np.random.default_rng(seed)
    return uniform_filter(
        rng.standard_normal(shape).astype(np.float32), 2
    ) * scale


def test_register_tps_densified_recovers_shift():
    """Task1 flow (register → masked TPS densify → smooth) must recover a
    synthetic translation inside the mask
    (l2r_2021_convexAdam_task1_docker.py:283-391)."""
    shape = (48, 48, 48)
    vol = _smooth_volume(shape)
    shift = (3, -2, 2)
    moving = np.roll(vol, shift, axis=(0, 1, 2))
    mask = np.zeros(shape, np.float32)
    mask[8:-8, 8:-8, 8:-8] = 1.0

    cfg = ConvexAdamConfig(
        mind_r=1, mind_d=2, lambda_weight=0.6, grid_sp=4, disp_hw=4,
        selected_niter=40, grid_sp_adam=3, ic=True,
    )
    dense = register_tps_densified(
        vol, moving, mask, num_samples=512, tps_step=4, cfg=cfg
    )
    assert dense.shape == shape + (3,)
    c = 12
    err = np.abs(dense[c:-c, c:-c, c:-c] - np.array(shift, np.float32))
    frac_ok = float(np.mean(np.all(err < 1.0, axis=-1)))
    assert frac_ok > 0.9, f"only {frac_ok:.2%} within 1 voxel"


def test_task1_field_to_original_identity_and_translation():
    """convert_crop_field re-derivation: with identical fixed/moving
    geometry a constant preprocessed-space displacement c maps to the
    original space as c/scale with the flipped axes' components negated
    (l2r_2021_convexAdam_task1_docker.py:38-105)."""
    pre_shape = (32, 32, 32)
    # original 64^3 at 1mm, cropped to [8, 40) and resampled to 2mm → 16...
    # choose crop span 64 voxels scaled to 32 → new_scale = 0.5, spacing 2mm
    meta = Task1CaseMeta(
        fix_shape=(64, 64, 64),
        fix_spacing=(1.0, 1.0, 1.0),
        fix_crop=((0.0, 0.0, 0.0), (64.0, 64.0, 64.0)),
        mov_shape=(64, 64, 64),
        mov_spacing=(1.0, 1.0, 1.0),
        mov_crop=((0.0, 0.0, 0.0), (64.0, 64.0, 64.0)),
        ref_spacing=(2.0, 2.0, 2.0),
        flip="xy",
    )
    # preprocessed spacings consistent with the meta (2mm iso)
    sp = np.array([2.0, 2.0, 2.0], np.float32)

    # identity: zero field stays zero
    zero = np.zeros(pre_shape + (3,), np.float32)
    out = task1_field_to_original(zero, sp, sp, meta)
    assert out.shape == (3, 32, 32, 32)
    np.testing.assert_allclose(out, 0.0, atol=1e-4)

    # constant displacement c (preprocessed voxels) → c / new_scale in
    # original voxels, x/y components negated by the flips
    c = np.array([2.0, -1.0, 3.0], np.float32)
    const = np.broadcast_to(c, pre_shape + (3,)).astype(np.float32)
    out = task1_field_to_original(const, sp, sp, meta)
    expect = c / 0.5  # new_scale = 32/64
    expect = expect * np.array([-1.0, -1.0, 1.0], np.float32)  # flip="xy"
    mid = out[:, 4:-4, 4:-4, 4:-4]
    np.testing.assert_allclose(
        mid, np.broadcast_to(expect.reshape(3, 1, 1, 1), mid.shape), atol=1e-2
    )


def test_landmark_centroids():
    seg = np.zeros((10, 10, 10), np.int32)
    seg[2:4, 2:4, 2:4] = 1
    seg[7, 8, 9] = 2
    c = landmark_centroids(seg, 3)
    np.testing.assert_allclose(c[0], [2.5, 2.5, 2.5])
    np.testing.assert_allclose(c[1], [7, 8, 9])
    assert np.isnan(c[2]).all()  # missing label


def test_curious_case_end_to_end():
    """CuRIOUS flow: deformable + rigid-from-field must both beat the
    identity landmark TRE on a translated synthetic case
    (l2r_2020_convexAdam_CuRIOUS.py:284-409)."""
    shape = (48, 48, 48)
    rng = np.random.default_rng(1)
    base = np.zeros(shape, np.float32)
    base[6:-6, 6:-6, 6:-6] = (
        _smooth_volume((36, 36, 36), seed=2, scale=50.0) + 100.0
    )
    shift = (3, -2, 2)
    moving_t1 = np.roll(base, shift, axis=(0, 1, 2))
    moving_fl = np.roll(base * 0.8, shift, axis=(0, 1, 2))

    # landmark balls at random interior positions
    seg_fixed = np.zeros(shape, np.int32)
    seg_moving = np.zeros(shape, np.int32)
    pts = rng.integers(14, 34, (5, 3))
    for i, p in enumerate(pts, start=1):
        seg_fixed[p[0] - 1: p[0] + 2, p[1] - 1: p[1] + 2, p[2] - 1: p[2] + 2] = i
        q = p + np.array(shift)
        seg_moving[q[0] - 1: q[0] + 2, q[1] - 1: q[1] + 2, q[2] - 1: q[2] + 2] = i

    res = curious_case(
        base, moving_t1, moving_fl, seg_fixed, seg_moving,
        grid_sp=4, disp_hw=3, mind_r=1, mind_d=2,
        mask_threshold=10.0, rigid_samples=1024,
    )
    tre0 = np.nanmean(res["tre0"])
    tre_def = np.nanmean(res["tre_def"])
    tre_rigid = np.nanmean(res["tre_rigid"])
    assert abs(tre0 - np.sqrt(sum(s**2 for s in shift))) < 0.5
    assert tre_def < 0.45 * tre0, (tre0, tre_def)
    assert tre_rigid < 0.45 * tre0, (tre0, tre_rigid)
    assert res["disp"].shape == shape + (3,)
    assert res["rigid"].shape == (4, 4)


def test_task2_case_recovers_shift():
    """Task2 lung-CT recipe (mask infill → single-box-filter cost volume →
    no-IC convex → Adam(50, 0.65) → triple smoothing → half-res field,
    l2r_2021_convexAdam_task2_docker.py:194-332) must recover a synthetic
    translation inside the lung mask."""
    shape = (48, 48, 48)
    vol = _smooth_volume(shape, seed=3)
    shift = (4, -3, 2)
    moving = np.roll(vol, shift, axis=(0, 1, 2))
    mask = np.zeros(shape, np.float32)
    mask[6:-6, 6:-6, 6:-6] = 1.0

    from convexadam_tpu.pipeline.challenges import task2_case

    out = task2_case(vol, moving, mask, np.roll(mask, shift, axis=(0, 1, 2)))
    assert out["disp"].shape == shape + (3,)
    assert out["disp_half"].shape == (3, 24, 24, 24)
    c = 14
    err = np.abs(out["disp"][c:-c, c:-c, c:-c] - np.array(shift, np.float32))
    frac_ok = float(np.mean(np.all(err < 1.0, axis=-1)))
    assert frac_ok > 0.9, f"only {frac_ok:.2%} within 1 voxel"
    # the half-res field carries the same (unscaled) voxel displacements
    err_h = np.abs(
        np.moveaxis(out["disp_half"], 0, -1)[7:-7, 7:-7, 7:-7]
        - np.array(shift, np.float32)
    )
    assert float(np.mean(np.all(err_h < 1.0, axis=-1))) > 0.9


def _label_volume(shape, seed):
    # chunky organ-like label blobs: quantile-digitized LARGE-scale smoothed
    # noise (fine speckle labels make the one-hot cost landscape degenerate
    # at grid_sp=2 — not representative of anatomy)
    rng = np.random.default_rng(seed)
    v = uniform_filter(rng.standard_normal(shape).astype(np.float32), 6)
    q = np.quantile(v, [0.25, 0.5, 0.75])
    return np.digitize(v, q).astype(np.int32)  # labels 0..3


def test_task3_case_recovers_shift():
    """Task3 OASIS recipe (one-hot features, SAD cost, single box filter,
    no IC, Adam(100, 1.25) with DOUBLE smoothing, half-res field,
    l2r_2021_convexAdam_task3_docker.py:109-233) must recover a synthetic
    translation, with per-pair and frozen template weights alike."""
    import jax.numpy as jnp

    from convexadam_tpu.core.features import semantic_template_weights
    from convexadam_tpu.pipeline.challenges import task3_case

    shape = (48, 48, 48)
    seg = _label_volume(shape, seed=5)
    shift = (2, -3, 1)
    seg_m = np.roll(seg, shift, axis=(0, 1, 2))

    out = task3_case(seg, seg_m, num_labels=4)
    assert out["disp"].shape == shape + (3,)
    assert out["disp_half"].shape == (3, 24, 24, 24)
    c = 10
    err = out["disp"][c:-c, c:-c, c:-c] - np.array(shift, np.float32)
    frac_ok = float(np.mean(np.all(np.abs(err) < 1.0, axis=-1)))
    assert frac_ok > 0.8, f"only {frac_ok:.2%} within 1 voxel"
    assert np.all(np.abs(np.median(err.reshape(-1, 3), axis=0)) < 0.5)

    w = np.asarray(semantic_template_weights(
        jnp.asarray(seg), jnp.asarray(seg_m), 4
    ))
    assert w.shape == (4,) and abs(w.mean() - 1.0) < 1e-5
    out_w = task3_case(seg, seg_m, num_labels=4, template_weights=w)
    err_w = np.abs(out_w["disp"][c:-c, c:-c, c:-c] - np.array(shift, np.float32))
    assert float(np.mean(np.all(err_w < 1.0, axis=-1))) > 0.8


def test_curious_real_landmark_geometry():
    """CuRIOUS on the REAL Case1 landmark geometry (VERDICT r3 missing#1):
    landmark volumes reconstructed exactly from the reference snapshot's
    l2r_2020_curious_landmarks.zip, ground-truth deformation = TPS through
    the real MRI<->US correspondences (mean 4.3 / max 8.9 voxel brain
    shift), synthetic multimodal texture (see tests/curious_real.py).
    Deformable must clearly beat the real initial TRE; the LTS rigid must
    at least improve it (reference eval: l2r_2020_convexAdam_CuRIOUS.py:
    359-409)."""
    from tests.curious_real import build_case

    case = build_case(1)
    res = curious_case(
        case["us"], case["t1"], case["flair"],
        case["seg_us"], case["seg_mri"],
        grid_sp=4, disp_hw=3, mind_r=2, mind_d=2,
        mask_threshold=10.0, rigid_samples=2048,
    )
    tre0 = np.nanmean(res["tre0"])
    tre_def = np.nanmean(res["tre_def"])
    tre_rigid = np.nanmean(res["tre_rigid"])
    # the reconstructed-ball TRE0 must match the real centroid TRE0
    assert abs(tre0 - case["tre0_true"].mean()) < 0.2, (
        tre0, case["tre0_true"].mean()
    )
    assert tre_def < 0.5 * tre0, (tre0, tre_def)
    assert tre_rigid < 0.85 * tre0, (tre0, tre_rigid)
