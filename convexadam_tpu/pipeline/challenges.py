"""Composed challenge-entry flows (reference root scripts, SURVEY.md §2.4).

End-to-end compositions the library-level capabilities plug into:

* **Task1 (Abdomen MR-CT)** — register, densify the masked field with a
  thin-plate spline, and resample the physical displacement field back into
  the original (un-cropped, un-resampled) image space
  (l2r_2021_convexAdam_task1_docker.py:38-105, 283-413).
* **Task2 (Lung CT exhale-inhale)** — EDT lung-mask infill, single
  box-filter cost volume, no inverse consistency, Adam at grid 2,
  half-resolution submission field (l2r_2021_convexAdam_task2_docker.py:194-332).
* **Task3 (OASIS brain MRI)** — frozen-template-weighted one-hot features,
  SAD cost metric, double Adam smoothing, half-resolution field
  (l2r_2021_convexAdam_task3_docker.py:109-233).
* **CuRIOUS 2020 (MRI-US)** — multichannel MIND, mask-gated cost volumes,
  coupled convex + inverse consistency, least-trimmed-squares rigid
  extraction from the deformable field, landmark TRE evaluation
  (l2r_2020_convexAdam_CuRIOUS.py:284-409).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.convex import coupled_convex
from convexadam_tpu.core.cost_volume import correlate_masked, displacement_mesh
from convexadam_tpu.core.features import mindssc
from convexadam_tpu.core.rigid import rigid_from_field, thin_plate_dense
from convexadam_tpu.core.smoothing import avg_pool3d, box_smooth_repeated
from convexadam_tpu.core.warp import (
    grid_sample_3d,
    identity_grid_normalized,
    inverse_consistency,
    resize_trilinear,
    warp_with_displacement,
)
from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam_jax


# ---------------------------------------------------------------------------
# Task 1: TPS densification + original-space resampling
# ---------------------------------------------------------------------------

def register_tps_densified(
    img_fixed: np.ndarray,
    img_moving: np.ndarray,
    fixed_mask: np.ndarray,
    num_samples: int = 4096,
    tps_step: int = 4,
    smooth: bool = True,
    cfg: ConvexAdamConfig | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Task1 registration: ConvexAdam (grid_sp=4, disp_hw=8, Adam at
    grid_sp=3 / 40 iters / lambda=0.6) followed by thin-plate-spline
    densification from masked samples of the field
    (l2r_2021_convexAdam_task1_docker.py:289-391).

    The reference samples up to 4096 stride-3 grid positions inside the
    fixed mask, fits a TPS to the field there, evaluates it on a stride-4
    grid, upsamples, and triple-box-smooths.  Returns (H, W, D, 3) voxels.
    """
    if cfg is None:
        cfg = ConvexAdamConfig(
            mind_r=1, mind_d=2, lambda_weight=0.6, grid_sp=4, disp_hw=8,
            selected_niter=40, grid_sp_adam=3, ic=True,
        )
    H, W, D = img_fixed.shape
    disp = np.asarray(
        convex_adam_jax(jnp.asarray(img_fixed, jnp.float32),
                        jnp.asarray(img_moving, jnp.float32), cfg),
        np.float32,
    )  # (H, W, D, 3) voxels

    # control points: the reference builds an align_corners=True (H//3,
    # W//3, D//3) lattice — normalized coords linspace(-1, 1, n) per axis,
    # i.e. voxels i*(H-1)/(H//3-1), STRETCHED across the full extent, not
    # the 3i+1 grid — masks it with fixed_mask[1::3,1::3,1::3] (cropped to
    # the lattice shape; a deliberate reference quirk: the mask is read at
    # 3i+1 while the point sits at the stretched position), randperms 4096,
    # and grid_samples the dense field there with align_corners=False
    # (task1_docker.py:365-374).  Only the permutation RNG differs (ours is
    # seeded; torch.randperm was unseeded).
    n3 = (H // 3, W // 3, D // 3)
    mask3 = (
        np.asarray(fixed_mask, np.float32)[1::3, 1::3, 1::3]
        [: n3[0], : n3[1], : n3[2]] > 0
    )
    axes = [np.linspace(-1.0, 1.0, n, dtype=np.float32) for n in n3]
    lattice = np.stack(
        np.meshgrid(*axes, indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (M, 3) normalized, array order
    pts_norm = lattice[mask3.reshape(-1)]
    rng = np.random.default_rng(seed)
    pts_norm = pts_norm[rng.permutation(len(pts_norm))[:num_samples]]

    # field values at the (non-integer) control positions — trilinear
    # grid_sample with the reference's default align_corners=False
    vals = np.asarray(grid_sample_3d(
        jnp.moveaxis(jnp.asarray(disp), -1, 0),
        jnp.asarray(pts_norm).reshape(-1, 1, 1, 3),
        align_corners=False,
    )).reshape(3, -1).T  # (n, 3) voxels

    scale = (np.array([H, W, D], np.float32) - 1.0) / 2.0
    x1 = jnp.asarray(pts_norm, jnp.float32)
    y1 = jnp.asarray(vals / scale, jnp.float32)

    dense = thin_plate_dense(x1, y1, (H, W, D), tps_step, 0.0)  # (H,W,D,3) norm.
    dense_vox = jnp.moveaxis(dense, -1, 0) * jnp.asarray(scale).reshape(3, 1, 1, 1)
    if smooth:
        dense_vox = box_smooth_repeated(dense_vox, 3, 3)
    return np.asarray(jnp.moveaxis(dense_vox, 0, -1), np.float32)


@dataclasses.dataclass(frozen=True)
class Task1CaseMeta:
    """Per-case preprocessing metadata (the reference's ``cases.csv`` row,
    l2r_2021_convexAdam_task1_docker.py:39-50): original shapes/spacings and
    the crop boxes that produced the preprocessed volumes."""

    fix_shape: tuple[int, int, int]
    fix_spacing: tuple[float, float, float]
    fix_crop: tuple[tuple[float, float, float], tuple[float, float, float]]  # (lo, hi)
    mov_shape: tuple[int, int, int]
    mov_spacing: tuple[float, float, float]
    mov_crop: tuple[tuple[float, float, float], tuple[float, float, float]]
    ref_spacing: tuple[float, float, float] = (2.0, 2.0, 2.0)
    flip: str = "xy"


def task1_field_to_original(
    disp_vox: np.ndarray,
    fix_spacing_pre: np.ndarray,
    mov_spacing_pre: np.ndarray,
    meta: Task1CaseMeta,
) -> np.ndarray:
    """Convert a voxel displacement field in the preprocessed (cropped +
    resampled) space into a half-resolution field over the ORIGINAL fixed
    image grid (l2r_2021_convexAdam_task1_docker.py:38-105 + :393-400).

    Steps (re-derivation of ``convert_crop_field``):
      1. physical displacement in the preprocessed space:
         ``disp_p[x] = (x + disp[x])·mov_spacing_pre − x·fix_spacing_pre``,
      2. for every voxel of the original fixed grid, map through the
         crop/scale affine into preprocessed-fixed coordinates and sample
         ``disp_p`` there (border padding, align_corners=True),
      3. physical moving position → preprocessed moving coords → original
         moving voxel coords through the moving crop/scale affine,
      4. voxel displacement = estimate − identity; per-axis flips,
      5. trilinear downsample x0.5.

    Returns (3, H0/2, W0/2, D0/2) float32 (the submission ``.npz`` payload).
    """
    H, W, D = disp_vox.shape[:3]
    fix_sp = jnp.asarray(fix_spacing_pre, jnp.float32)
    mov_sp = jnp.asarray(mov_spacing_pre, jnp.float32)
    grid_vox = (identity_grid_normalized((H, W, D), True) + 1.0) * jnp.asarray(
        [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], jnp.float32
    )
    disp_p = (grid_vox + jnp.asarray(disp_vox)) * mov_sp - grid_vox * fix_sp
    disp_p = jnp.moveaxis(disp_p, -1, 0)  # (3, H, W, D) physical units

    fix_shape = np.asarray(meta.fix_shape, np.float32)
    fix_spacing = np.asarray(meta.fix_spacing, np.float32)
    fix_crop = np.asarray(meta.fix_crop, np.float32)  # (2, 3)
    mov_spacing = np.asarray(meta.mov_spacing, np.float32)
    mov_crop = np.asarray(meta.mov_crop, np.float32)
    ref_spacing = np.asarray(meta.ref_spacing, np.float32)

    new_shape = np.round((fix_crop[1] - fix_crop[0]) * fix_spacing / ref_spacing)
    new_fix_scale = new_shape / (fix_crop[1] - fix_crop[0])
    new_fix_spacing = fix_spacing / new_fix_scale
    new_mov_scale = new_shape / (mov_crop[1] - mov_crop[0])
    new_mov_spacing = mov_spacing / new_mov_scale

    H0, W0, D0 = (int(s) for s in fix_shape)
    orig_grid = (identity_grid_normalized((H0, W0, D0), True) + 1.0) * jnp.asarray(
        [(H0 - 1) / 2.0, (W0 - 1) / 2.0, (D0 - 1) / 2.0], jnp.float32
    )  # (H0, W0, D0, 3) original voxel coords

    # original fixed voxel → preprocessed-fixed coords (fix_affine inverse:
    # x_pre = (x_orig − crop_lo) · new_fix_scale)
    pre_coords = (orig_grid - jnp.asarray(fix_crop[0])) * jnp.asarray(new_fix_scale)
    # normalized (align_corners=True) over the preprocessed grid (H, W, D)
    pre_scale = jnp.asarray(
        [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], jnp.float32
    )
    pre_norm = pre_coords / pre_scale - 1.0
    disp_p_s = grid_sample_3d(
        disp_p, pre_norm, align_corners=True, padding_mode="border"
    )  # (3, H0, W0, D0)
    disp_p_s = jnp.moveaxis(disp_p_s, 0, -1)

    mov_pre_est = (
        pre_coords * jnp.asarray(new_fix_spacing) + disp_p_s
    ) / jnp.asarray(new_mov_spacing)
    # preprocessed moving coords → original moving voxels (mov_affine:
    # x_orig = x_pre / new_mov_scale + mov_crop_lo)
    mov_orig_est = mov_pre_est / jnp.asarray(new_mov_scale) + jnp.asarray(
        mov_crop[0]
    )
    disp_out = mov_orig_est - orig_grid  # (H0, W0, D0, 3) voxels

    for ax, name in enumerate("xyz"):
        if name in meta.flip:
            disp_out = jnp.flip(disp_out, axis=ax)
            disp_out = disp_out.at[..., ax].multiply(-1.0)

    disp_out = jnp.moveaxis(disp_out, -1, 0)
    half = tuple(s // 2 for s in (H0, W0, D0))
    disp_half = resize_trilinear(disp_out, half, align_corners=False)
    return np.asarray(disp_half, np.float32)


# ---------------------------------------------------------------------------
# Task 2: lung CT exhale-inhale
# ---------------------------------------------------------------------------

TASK2_CONFIG = ConvexAdamConfig(
    mind_r=1, mind_d=2, lambda_weight=0.65, grid_sp=4, disp_hw=6,
    selected_niter=50, selected_smooth=3, grid_sp_adam=2, ic=False,
    cost_smooth_passes=1,
)
"""The lung-CT recipe (l2r_2021_convexAdam_task2_docker.py): grid_sp=4,
disp_hw=6 (:210-211), a SINGLE cost-volume box filter (:60), no inverse
consistency (:245-248 commented out), Adam at grid 2 with 50 iterations and
lambda=0.65 (:276-278), triple 3^3 post-smoothing (:302)."""


def task2_case(
    img_fixed: np.ndarray,
    img_moving: np.ndarray,
    fixed_mask: np.ndarray,
    moving_mask: np.ndarray,
    cfg: ConvexAdamConfig = TASK2_CONFIG,
) -> dict:
    """One lung-CT exhale-inhale case (l2r_2021_convexAdam_task2_docker.py:194-332):
    EDT nearest-inside infill of both volumes outside their lung masks
    (:215-226, shared with the packaged use_mask path), the :data:`TASK2_CONFIG`
    registration, and the half-resolution submission field (:305).

    Returns {"disp": (H, W, D, 3) voxels, "disp_half": (3, H/2, W/2, D/2)
    — the submission ``.npz`` payload layout}.
    """
    from convexadam_tpu.pipeline.preprocess import mask_infill

    fixed_r = mask_infill(np.asarray(img_fixed, np.float32),
                          np.asarray(fixed_mask, np.float32))
    moving_r = mask_infill(np.asarray(img_moving, np.float32),
                           np.asarray(moving_mask, np.float32))
    disp = convex_adam_jax(
        jnp.asarray(fixed_r, jnp.float32), jnp.asarray(moving_r, jnp.float32), cfg
    )  # (H, W, D, 3)
    H, W, D = fixed_r.shape
    disp_half = resize_trilinear(
        jnp.moveaxis(disp, -1, 0), (H // 2, W // 2, D // 2), align_corners=False
    )
    return {
        "disp": np.asarray(disp, np.float32),
        "disp_half": np.asarray(disp_half, np.float32),
    }


# ---------------------------------------------------------------------------
# Task 3: OASIS brain MRI (semantic features, SAD cost)
# ---------------------------------------------------------------------------

TASK3_CONFIG = ConvexAdamConfig(
    lambda_weight=1.25, grid_sp=2, disp_hw=3, selected_niter=100,
    selected_smooth=0, grid_sp_adam=2, ic=False,
    cost_metric="sad", cost_smooth_passes=1, adam_smoother=("box", 3, 2),
)
"""The OASIS recipe (l2r_2021_convexAdam_task3_docker.py): grid_sp=2,
disp_hw=3 (:109-110), SAD (absolute-difference) cost with a single box
filter (:54,:47), no inverse consistency, Adam with 100 iterations,
lambda=1.25 and DOUBLE (not triple) 3^3 smoothing (:186-191)."""


def task3_case(
    seg_fixed: np.ndarray,
    seg_moving: np.ndarray,
    num_labels: int,
    template_weights: "np.ndarray | None" = None,
    cfg: ConvexAdamConfig = TASK3_CONFIG,
) -> dict:
    """One OASIS inter-subject case (l2r_2021_convexAdam_task3_docker.py:109-233):
    weighted one-hot features of the predicted segmentations — with the
    script's frozen template weights when given (:118-120, derive them via
    :func:`~convexadam_tpu.core.features.semantic_template_weights`), else
    per-pair weights — then the :data:`TASK3_CONFIG` registration and the
    half-resolution submission field (:216).

    Returns {"disp": (H, W, D, 3) voxels, "disp_half": (3, H/2, W/2, D/2)}.
    """
    from convexadam_tpu.core.features import semantic_features
    from convexadam_tpu.pipeline.convex_adam import convex_adam_features

    H, W, D = np.asarray(seg_fixed).shape
    ff, fm = semantic_features(
        jnp.asarray(seg_fixed), jnp.asarray(seg_moving),
        num_labels=num_labels, mult=10.0, dtype=cfg.compute_dtype,
        weights=None if template_weights is None
        else jnp.asarray(template_weights, jnp.float32),
    )
    disp = convex_adam_features(ff, fm, cfg)  # (H, W, D, 3)
    disp_half = resize_trilinear(
        jnp.moveaxis(disp, -1, 0), (H // 2, W // 2, D // 2), align_corners=False
    )
    return {
        "disp": np.asarray(disp, np.float32),
        "disp_half": np.asarray(disp_half, np.float32),
    }


# ---------------------------------------------------------------------------
# CuRIOUS 2020: MRI-US with rigid extraction + landmark TRE
# ---------------------------------------------------------------------------

def landmark_centroids(seg: np.ndarray, num_landmarks: int) -> np.ndarray:
    """Mean voxel coordinate of each landmark label 1..num_landmarks
    (l2r_2020_convexAdam_CuRIOUS.py:312-317).  Missing labels → NaN row."""
    out = np.full((num_landmarks, 3), np.nan, np.float32)
    for i in range(1, num_landmarks + 1):
        pos = np.nonzero(seg == i)
        if len(pos[0]):
            out[i - 1] = [p.mean() for p in pos]
    return out


def _tre(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.sqrt(((a - b) ** 2).sum(-1))


def curious_case(
    img_fixed_us: np.ndarray,
    img_moving_t1: np.ndarray,
    img_moving_flair: np.ndarray,
    seg_fixed: np.ndarray,
    seg_moving: np.ndarray,
    grid_sp: int = 6,
    disp_hw: int = 6,
    mind_r: int = 3,
    mind_d: int = 3,
    mask_threshold: float = 10.0,
    ic_iters: int = 5,
    rigid_samples: int = 4096,
) -> dict:
    """One CuRIOUS MRI-US case (l2r_2020_convexAdam_CuRIOUS.py:284-409):

      1. MIND(r=3, d=3) on US (duplicated to 24 channels) vs T1+FLAIR
         concatenated (:323-327),
      2. mask-gated cost volumes (``ssd *= mask``, :336,349) both directions,
         coupled convex + inverse consistency (5 iters),
      3. least-trimmed-squares rigid transform extracted from the masked
         deformable field (:359-371; we fit in voxel space — a true rigid in
         the isotropically-sampled array — where the reference fits in
         torch's normalized coordinates),
      4. landmark TRE of identity / deformable / rigid (labels are landmark
         balls; distance between label centroids).

    Returns {"tre0", "tre_def", "tre_rigid" (per-landmark voxel TREs),
    "disp" (H, W, D, 3), "rigid" (4x4)}.
    """
    H, W, D = img_fixed_us.shape
    f32 = jnp.float32
    us = jnp.asarray(img_fixed_us, f32)
    t1 = jnp.asarray(img_moving_t1, f32)
    fl = jnp.asarray(img_moving_flair, f32)

    mf = mindssc(us, mind_r, mind_d)
    mt1 = mindssc(t1, mind_r, mind_d)
    mfl = mindssc(fl, mind_r, mind_d)
    fix_feat = jnp.concatenate(
        [avg_pool3d(mf, grid_sp, stride=grid_sp)] * 2, axis=0
    )
    mov_feat = jnp.concatenate(
        [
            avg_pool3d(mt1, grid_sp, stride=grid_sp),
            avg_pool3d(mfl, grid_sp, stride=grid_sp),
        ],
        axis=0,
    )
    mask_fix = (
        avg_pool3d((us > mask_threshold).astype(f32)[None], grid_sp, stride=grid_sp)[0]
        > 0.5
    )
    mask_mov = (
        avg_pool3d((t1 > mask_threshold).astype(f32)[None], grid_sp, stride=grid_sp)[0]
        > 0.5
    )

    mesh = displacement_mesh(disp_hw)
    ssd, am = correlate_masked(fix_feat, mov_feat, mask_fix, disp_hw)
    disp_soft = coupled_convex(ssd, am, mesh)
    ssd_r, am_r = correlate_masked(mov_feat, fix_feat, mask_mov, disp_hw)
    disp_soft_r = coupled_convex(ssd_r, am_r, mesh)
    h, w, d = disp_soft.shape[1:]
    scale = jnp.array(
        [(h - 1) / 2.0, (w - 1) / 2.0, (d - 1) / 2.0], f32
    ).reshape(3, 1, 1, 1)
    disp_ice, _ = inverse_consistency(
        disp_soft / scale, disp_soft_r / scale, ic_iters
    )
    disp_hr = resize_trilinear(
        disp_ice * scale * grid_sp, (H, W, D), align_corners=False
    )  # (3, H, W, D) voxels

    # rigid from the masked field (least-trimmed squares)
    mask_hr = resize_trilinear(
        mask_fix[None].astype(f32), (H, W, D), align_corners=False
    )[0] > 0.5
    R = rigid_from_field(
        disp_hr, mask=mask_hr, num_samples=rigid_samples, iters=15
    )

    # landmark TREs
    num_landmarks = int(np.asarray(seg_moving).max())
    c_fix = landmark_centroids(np.asarray(seg_fixed), num_landmarks)
    c_mov = landmark_centroids(np.asarray(seg_moving), num_landmarks)

    seg_m = jnp.asarray(seg_moving, f32)[None]
    warped_def = np.asarray(
        warp_with_displacement(seg_m, disp_hr, mode="nearest")[0]
    ).round().astype(np.int32)
    c_def = landmark_centroids(warped_def, num_landmarks)

    # rigid warp: sample the moving labels at R-transformed positions
    grid_vox = (identity_grid_normalized((H, W, D), True) + 1.0) * jnp.asarray(
        [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], f32
    )
    pts = grid_vox.reshape(-1, 3)
    pts_h = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), f32)], axis=1)
    moved = (pts_h @ jnp.asarray(R).T)[:, :3].reshape(H, W, D, 3)
    disp_rigid = jnp.moveaxis(moved - grid_vox, -1, 0)
    warped_rigid = np.asarray(
        warp_with_displacement(seg_m, disp_rigid, mode="nearest")[0]
    ).round().astype(np.int32)
    c_rigid = landmark_centroids(warped_rigid, num_landmarks)

    return {
        "tre0": _tre(c_fix, c_mov),
        "tre_def": _tre(c_fix, c_def),
        "tre_rigid": _tre(c_fix, c_rigid),
        "disp": np.asarray(jnp.moveaxis(disp_hr, 0, -1), np.float32),
        "rigid": np.asarray(R, np.float32),
    }
