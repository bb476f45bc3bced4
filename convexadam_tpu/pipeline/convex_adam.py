"""The ConvexAdam registration pipeline (MIND and semantic front-ends).

Primary public API, equivalent to ``convex_adam_pt``
(reference src/convexAdam/convex_adam_MIND.py:64-202) and the nnU-Net variant
(src/convexAdam/convex_adam_nnUNet.py:41-159):

  1. feature extraction (MIND-SSC or weighted one-hot semantic features),
  2. average-pool to the coarse grid ``grid_sp``,
  3. dense SSD cost volume over ``(2*disp_hw+1)**3`` displacements,
  4. coupled convex optimisation (global regularisation),
  5. optional inverse-consistency with the reverse-direction field,
  6. optional Adam instance optimisation at ``grid_sp_adam`` resolution,
  7. optional cascaded box smoothing of the full-resolution field.

The whole pipeline is a single jitted function per hyperparameter setting
(hyperparameters are static → shapes are static), so one compilation serves
every case pair of a dataset and the function can be ``vmap``-ed over pairs
and ``shard_map``-ed over TPU meshes by the self-configuring sweep engine.

Deliberate deviation from the reference: with ``ic=False`` the packaged
reference returns the coarse-resolution field in coarse-voxel units
(convex_adam_MIND.py:144) — a unit bug its own challenge scripts avoid
(l2r_2021_convexAdam_task2_docker.py upsamples and rescales by ``grid_sp``).
We implement the clearly-intended behaviour (upsample + rescale).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.adam import adam_instance_optimisation
from convexadam_tpu.core.convex import convex_displacement
from convexadam_tpu.core.features import mindssc, semantic_features
from convexadam_tpu.core.smoothing import avg_pool3d, box_smooth_repeated
from convexadam_tpu.core.warp import inverse_consistency, resize_trilinear


@dataclasses.dataclass(frozen=True)
class ConvexAdamConfig:
    """Hyperparameters (all static under jit).

    Defaults match the reference CLI defaults (convex_adam_MIND.py:67-81).
    """

    mind_r: int = 1
    mind_d: int = 2
    lambda_weight: float = 1.25
    grid_sp: int = 6
    disp_hw: int = 4
    selected_niter: int = 80
    selected_smooth: int = 0
    grid_sp_adam: int = 2
    ic: bool = True
    # cost-volume metric: "ssd" (packaged pipelines) or "sad" (the OASIS
    # task-3 script uses absolute differences,
    # l2r_2021_convexAdam_task3_docker.py:54)
    cost_metric: str = "ssd"
    # number of 3^3 box-filter passes over the cost volume: 2 in the
    # packaged correlate (convex_adam_utils.py:83-85), 1 in the lung task-2
    # and OASIS task-3 forks (l2r_2021_convexAdam_task2_docker.py:60)
    cost_smooth_passes: int = 2
    # smoother applied to the raw Adam grid each iteration (see
    # core.adam.resolve_smoother): the packaged pipelines cascade three 3^3
    # boxes (convex_adam_MIND.py:166); task-3 uses two
    # (l2r_2021_convexAdam_task3_docker.py:191); the stage-2 sweep swaps in
    # Gaussian/Kovesi bank entries.
    adam_smoother: tuple = ("box", 3, 3)
    # dtype for features / cost volume: "auto" (bfloat16 on TPU, float32
    # elsewhere — the TPU-native equivalent of the reference's
    # device-conditional fp16 policy, convex_adam_MIND.py:79,89-91),
    # "float32", or "bfloat16".
    dtype: str = "auto"
    # snapshot iteration counts for multi-output runs (self-configuring);
    # empty for the standard single-output pipeline.
    snapshot_iters: tuple[int, ...] = ()
    # OPT-IN Adam data-term sample stride (default 1 = the reference's dense
    # data term, convex_adam_MIND.py:174-176).  With stride s the SSD is
    # evaluated on the (::s,)*3 sub-lattice of the Adam grid: the
    # per-index-bound gather — the measured Adam-loop floor — shrinks by
    # s^3, while smoothing, regularization and the output field stay
    # full-resolution.  Accuracy envelope: see core/adam.py docstring and
    # ROADMAP.md's on-chip measurement.
    adam_sample_stride: int = 1

    @property
    def compute_dtype(self):
        if self.dtype == "auto":
            return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def _convex_stage(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    cfg: ConvexAdamConfig,
    full_shape: tuple[int, int, int],
    for_adam_init: bool = False,
) -> jax.Array:
    """Stages 2-5: pooling, cost volume, coupled convex, inverse consistency.

    Returns the full-resolution displacement field (3, H, W, D) in voxels.

    ``for_adam_init=True`` returns the field at the resolution the reference
    feeds to the Adam-init resize instead: for ``ic=False`` that is the
    COARSE grid (the correct-units ic=False reference code — the task2/task3
    dockers, l2r_2021_convexAdam_task3_docker.py:159 — resizes
    ``disp_soft*grid_sp`` straight to the Adam grid in ONE interpolation;
    an extra round trip through full resolution blurs the init with a
    trilinear kernel, e.g. non-identity even when grid_sp == grid_sp_adam).
    For ``ic=True`` it stays full resolution: the reference interpolates the
    IC field to full res (convex_adam_MIND.py:141) and resizes THAT to the
    Adam grid (:153) — two interpolations, reproduced exactly.
    """
    H, W, D = full_shape
    g = cfg.grid_sp
    if min(H // g, W // g, D // g) < 2:
        # a 1-cell coarse axis makes the IC normalisation degenerate
        # ((n-1)/2 = 0); the reference silently emits NaN there
        raise ValueError(
            f"grid_sp={g} leaves a coarse grid of "
            f"{(H // g, W // g, D // g)} for volume {full_shape}; every "
            "coarse axis needs >= 2 cells"
        )
    fix_s = avg_pool3d(feat_fix, g, stride=g)
    mov_s = avg_pool3d(feat_mov, g, stride=g)

    disp_soft = convex_displacement(
        fix_s, mov_s, cfg.disp_hw,
        metric=cfg.cost_metric, smooth_passes=cfg.cost_smooth_passes,
    )

    if cfg.ic:
        h, w, d = disp_soft.shape[1:]
        scale = jnp.array(
            [(h - 1) / 2.0, (w - 1) / 2.0, (d - 1) / 2.0], jnp.float32
        ).reshape(3, 1, 1, 1)
        disp_soft_r = convex_displacement(
            mov_s, fix_s, cfg.disp_hw,
            metric=cfg.cost_metric, smooth_passes=cfg.cost_smooth_passes,
        )
        disp_ice, _ = inverse_consistency(
            disp_soft / scale, disp_soft_r / scale, iters=15
        )
        disp_hr = resize_trilinear(
            disp_ice * scale * g, (H, W, D), align_corners=False
        )
    else:
        if for_adam_init:
            return disp_soft * g  # coarse res, full-res voxel units
        disp_hr = resize_trilinear(disp_soft * g, (H, W, D), align_corners=False)
    return disp_hr


def _adam_stage(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hr: jax.Array,
    cfg: ConvexAdamConfig,
) -> tuple[jax.Array, jax.Array]:
    """Stage 6 (+7): instance optimisation and final smoothing.

    ``disp_hr`` is the Adam init in FULL-RES VOXEL UNITS at any spatial
    resolution — full res for ic=True, the coarse convex grid for ic=False
    (see ``_convex_stage(for_adam_init=True)``); one trilinear resize takes
    it to the Adam grid either way, exactly like the reference
    (convex_adam_MIND.py:153 / l2r_2021_convexAdam_task3_docker.py:159).

    Returns (final field, snapshot fields), both (.., 3, H, W, D) full-res
    voxel-unit displacements.
    """
    H, W, D = feat_fix.shape[1:]
    g2 = cfg.grid_sp_adam
    if min(H // g2, W // g2, D // g2) < 2:
        raise ValueError(
            f"grid_sp_adam={g2} leaves an Adam grid of "
            f"{(H // g2, W // g2, D // g2)} for volume {(H, W, D)}; every "
            "axis needs >= 2 cells"
        )
    patch_fix = avg_pool3d(feat_fix.astype(jnp.float32), g2, stride=g2)
    # the moving features stay in the configured compute dtype: with bf16
    # the corner-stack gather traffic halves (the reference analogously
    # keeps fp16 features on GPU, convex_adam_MIND.py:79); accumulation in
    # the sampler is f32 either way
    patch_mov = avg_pool3d(
        feat_mov.astype(jnp.float32), g2, stride=g2
    ).astype(cfg.compute_dtype)

    disp_lr = resize_trilinear(
        disp_hr, (H // g2, W // g2, D // g2), align_corners=False
    )
    fitted, snaps = adam_instance_optimisation(
        patch_fix,
        patch_mov,
        disp_lr / g2,
        lambda_weight=cfg.lambda_weight,
        niter=cfg.selected_niter,
        snapshot_iters=cfg.snapshot_iters,
        smoother=cfg.adam_smoother,
        sample_stride=cfg.adam_sample_stride,
    )

    def upsample_and_smooth(field):
        out = resize_trilinear(field * g2, (H, W, D), align_corners=False)
        k = cfg.selected_smooth
        if k > 0:
            if k % 2 == 0:
                k += 1  # reference warns for even kernels; we round up
            out = box_smooth_repeated(out, k, 3)
        return out

    final = upsample_and_smooth(fitted)
    snaps_hr = (
        jax.vmap(upsample_and_smooth)(snaps)
        if cfg.snapshot_iters
        else jnp.zeros((0, 3, H, W, D), jnp.float32)
    )
    return final, snaps_hr


@functools.partial(jax.jit, static_argnames=("cfg",))
def convex_adam_features(
    feat_fix: jax.Array, feat_mov: jax.Array, cfg: ConvexAdamConfig
) -> jax.Array:
    """Run stages 2-7 on precomputed full-resolution features (C, H, W, D).

    Returns the displacement field (H, W, D, 3), array-order channels, voxels.
    """
    H, W, D = feat_fix.shape[1:]
    run_adam = cfg.lambda_weight > 0
    disp_hr = _convex_stage(
        feat_fix, feat_mov, cfg, (H, W, D), for_adam_init=run_adam
    )
    if run_adam:
        disp_hr, _ = _adam_stage(feat_fix, feat_mov, disp_hr, cfg)
    return jnp.moveaxis(disp_hr, 0, -1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def convex_adam_jax(
    img_fixed: jax.Array, img_moving: jax.Array, cfg: ConvexAdamConfig = ConvexAdamConfig()
) -> jax.Array:
    """Full MIND pipeline on raw intensity volumes (H, W, D).

    JAX equivalent of ``convex_adam_pt`` (convex_adam_MIND.py:64-202).
    Returns the displacement field (H, W, D, 3) in voxel units (dH, dW, dD).
    """
    dt = cfg.compute_dtype
    feat_fix = mindssc(img_fixed.astype(jnp.float32), cfg.mind_r, cfg.mind_d, dtype=dt)
    feat_mov = mindssc(img_moving.astype(jnp.float32), cfg.mind_r, cfg.mind_d, dtype=dt)
    return convex_adam_features(feat_fix, feat_mov, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "num_labels", "mult"))
def convex_adam_semantic_jax(
    pred_fixed: jax.Array,
    pred_moving: jax.Array,
    cfg: ConvexAdamConfig = ConvexAdamConfig(),
    num_labels: int = 2,
    mult: float = 10.0,
) -> jax.Array:
    """nnU-Net semantic pipeline on label volumes (H, W, D) of integer labels.

    JAX equivalent of convex_adam_nnUNet.py:41-159 (features:19-38).
    """
    dt = cfg.compute_dtype
    feat_fix, feat_mov = semantic_features(
        pred_fixed, pred_moving, num_labels=num_labels, mult=mult, dtype=dt
    )
    return convex_adam_features(feat_fix, feat_mov, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "iters", "smoothings"))
def convex_adam_multi_output(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    cfg: ConvexAdamConfig = ConvexAdamConfig(),
    iters: tuple[int, ...] = (40, 60, 80),
    smoothings: tuple[int, ...] = (0, 3, 5),
) -> jax.Array:
    """Multi-output run on precomputed features: one optimisation, fields
    snapshotted at every iteration count in ``iters`` and post-smoothed with
    every cascade in ``smoothings`` (0 = none, else triple k^3 box).

    Equivalent of the self-configuring multi-output pipeline forks that
    return 9 = {40,60,80} x {0,3,5} variants from a single Adam run
    (reference self_configuring/convex_adam_MIND.py:115-147).  Returns
    (len(iters), len(smoothings), H, W, D, 3).
    """
    H, W, D = feat_fix.shape[1:]
    g2 = cfg.grid_sp_adam
    if min(H // g2, W // g2, D // g2) < 2:
        raise ValueError(
            f"grid_sp_adam={g2} leaves an Adam grid of "
            f"{(H // g2, W // g2, D // g2)} for volume {(H, W, D)}; every "
            "axis needs >= 2 cells"
        )
    disp_init = _convex_stage(
        feat_fix, feat_mov, cfg, (H, W, D), for_adam_init=True
    )

    patch_fix = avg_pool3d(feat_fix.astype(jnp.float32), g2, stride=g2)
    patch_mov = avg_pool3d(feat_mov.astype(jnp.float32), g2, stride=g2).astype(
        cfg.compute_dtype
    )
    disp_lr = resize_trilinear(
        disp_init, (H // g2, W // g2, D // g2), align_corners=False
    )
    _, snaps = adam_instance_optimisation(
        patch_fix,
        patch_mov,
        disp_lr / g2,
        lambda_weight=cfg.lambda_weight,
        niter=max(iters),
        snapshot_iters=iters,
        smoother=cfg.adam_smoother,
    )

    outs = []
    for i in range(len(iters)):
        hr = resize_trilinear(snaps[i] * g2, (H, W, D), align_corners=False)
        row = []
        for k in smoothings:
            if k > 0 and k % 2 == 0:
                k += 1  # even kernels shift by half a voxel; round up like
                # the single-output path (_adam_stage)
            row.append(
                jnp.moveaxis(box_smooth_repeated(hr, k, 3) if k > 0 else hr, 0, -1)
            )
        outs.append(jnp.stack(row))
    return jnp.stack(outs)


def convex_adam_semantic_from_images(
    img_fixed,
    img_moving,
    predict_logits,
    patch_size,
    cfg: "ConvexAdamConfig | None" = None,
    num_labels: "int | None" = None,
    mult: float = 10.0,
    normalize: bool = True,
    step_size: float = 0.5,
) -> np.ndarray:
    """End-to-end semantic registration from raw intensity volumes.

    Closes the loop the reference leaves external (it loads nnU-Net
    predictions from a ``predictedlabels`` directory,
    main_for_l2r3_nnUNet.py:76-80): nnU-Net-style intensity normalisation →
    Gaussian-blended sliding-window segmentation (``predict_logits``: a
    patch → logits function, e.g. a bound ``models.UNet3D``) → weighted
    one-hot semantic registration (convex_adam_nnUNet.py:41-159).

    Returns the displacement field (H, W, D, 3) in voxels.
    """
    from convexadam_tpu.core.features import nnunet_norm
    from convexadam_tpu.models.segmentation import sliding_window_predict

    if cfg is None:
        cfg = ConvexAdamConfig()
    f = validate_volume(img_fixed)
    m = validate_volume(img_moving)
    if normalize:
        f = np.asarray(nnunet_norm(jnp.asarray(f)))
        m = np.asarray(nnunet_norm(jnp.asarray(m)))
    pred_f = sliding_window_predict(predict_logits, f, patch_size, step_size)
    pred_m = sliding_window_predict(predict_logits, m, patch_size, step_size)
    if num_labels is None:
        num_labels = int(max(pred_f.max(), pred_m.max())) + 1
    out = convex_adam_semantic_jax(
        jnp.asarray(pred_f), jnp.asarray(pred_m), cfg,
        num_labels=num_labels, mult=mult,
    )
    return np.asarray(out, np.float32)


def validate_volume(img) -> np.ndarray:
    """Accept numpy / jax arrays, MedicalImage, torch tensors, nibabel
    spatial images, or SimpleITK images → float numpy volume (the
    reference's ``validate_image`` adapter, convex_adam_utils.py:268-279).

    nibabel / SimpleITK are duck-typed (neither is a dependency of this
    package): a nibabel image exposes ``get_fdata``; a SimpleITK image is
    converted through the ``GetArrayFromImage`` function of whatever module
    defines its class — so the caller's own SimpleITK build is used.  Note
    SimpleITK arrays come out in (z, y, x) index order, exactly as the
    reference's ``sitk.GetArrayFromImage`` branch behaves."""
    import sys

    from convexadam_tpu.geometry.image import MedicalImage

    if isinstance(img, MedicalImage):
        return np.asarray(img.data, np.float32)
    if isinstance(img, (np.ndarray, jnp.ndarray)):
        return np.asarray(img, np.float32)
    # nibabel SpatialImage (convex_adam_utils.py:276-277)
    if hasattr(img, "get_fdata"):
        return np.asarray(img.get_fdata(), np.float32)
    # SimpleITK Image (convex_adam_utils.py:272-273)
    mod = sys.modules.get(type(img).__module__)
    if mod is not None and hasattr(mod, "GetArrayFromImage"):
        return np.asarray(mod.GetArrayFromImage(img), np.float32)
    # torch tensors (and anything else numpy-convertible)
    if hasattr(img, "detach"):
        img = img.detach()
    if hasattr(img, "numpy"):
        return np.asarray(img.numpy(), np.float32)
    raise ValueError(
        "Input image must be a numpy/jax array, MedicalImage, torch tensor, "
        "nibabel image, or SimpleITK image"
    )


def convex_adam(
    img_fixed,
    img_moving,
    cfg: Optional[ConvexAdamConfig] = None,
    **overrides,
) -> np.ndarray:
    """Convenience host-level entry point (numpy/jax/MedicalImage/torch in,
    numpy out).  ``overrides`` are ConvexAdamConfig fields (e.g. ``grid_sp=4``)."""
    if cfg is None:
        cfg = ConvexAdamConfig(**overrides)
    elif overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    out = convex_adam_jax(
        jnp.asarray(validate_volume(img_fixed)),
        jnp.asarray(validate_volume(img_moving)),
        cfg,
    )
    return np.asarray(jax.device_get(out), dtype=np.float32)
