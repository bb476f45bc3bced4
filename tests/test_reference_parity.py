"""Cross-implementation parity against the UNMODIFIED reference.

The stored fixtures are displacement fields produced by running the actual
reference implementation (src/convexAdam/convex_adam_MIND.py:convex_adam_pt,
torch CPU, float32) on deterministic synthetic cases — regeneration recipe in
the fixture docstrings below.  This measures true end-to-end numerical
agreement of the whole pipeline (MIND → cost volume → coupled convex → IC →
Adam → smoothing), not agreement with our own past behaviour (that is
test_pipeline.test_golden_regression's job).

Measured at fixture-generation time: mean endpoint error 0.003 voxels,
p95 0.008, warped-image SSIM between implementations 0.9999999.

Config choice matters: on some settings the instance optimisation is
CHAOTIC — the reference amplifies a 1e-5 perturbation of its own Adam
init to 0.33 voxels (torch-vs-torch, grid_sp_adam=3 on 64³ smooth
synthetic data), so pointwise cross-implementation parity is only
meaningful on stable landscapes; the fixtures use configs measured stable
(cross-impl EPE p95 ≤ 0.01 voxels).
"""

import pathlib

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from convexadam_tpu.core.metrics import ssim3d
from convexadam_tpu.core.warp import warp_with_displacement
from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam_jax

_HERE = pathlib.Path(__file__).parent


def _case(seed, shift, shape=(64, 64, 64)):
    """Deterministic smooth synthetic pair (same construction the reference
    run used: double 3^3 avg-pool of N(0,1), z-scored to sigma=100)."""
    rng = np.random.default_rng(seed)
    vol = rng.standard_normal(shape).astype(np.float32)
    t = torch.from_numpy(vol)[None, None]
    for _ in range(2):
        t = F.avg_pool3d(t, 3, stride=1, padding=1)
    vol = t[0, 0].numpy()
    vol = (vol - vol.mean()) / vol.std() * 100
    mov = np.roll(vol, shift, axis=(0, 1, 2))
    return vol, mov


def _check_against_reference(fixture, cfg):
    ref = np.load(_HERE / fixture)
    vol, mov = _case(int(ref["seed"]), tuple(ref["shift"]))
    ours = np.asarray(
        convex_adam_jax(jnp.asarray(vol), jnp.asarray(mov), cfg), np.float32
    )
    rd = ref["disp"].astype(np.float32)
    epe = np.sqrt(((ours - rd) ** 2).sum(-1))
    assert np.percentile(epe, 95) < 0.05, np.percentile(epe, 95)
    assert epe.max() < 0.5, epe.max()
    wa = warp_with_displacement(
        jnp.asarray(mov)[None], jnp.moveaxis(jnp.asarray(ours), -1, 0)
    )[0]
    wb = warp_with_displacement(
        jnp.asarray(mov)[None], jnp.moveaxis(jnp.asarray(rd), -1, 0)
    )[0]
    assert float(ssim3d(wa, wb)) > 0.999


def test_field_matches_reference_default_path():
    """Reference run: convex_adam_pt(vol, mov, mind_r=1, mind_d=2,
    lambda_weight=1.25, grid_sp=4, disp_hw=3, selected_niter=40,
    selected_smooth=0, grid_sp_adam=2, ic=True, dtype=float32, cpu)."""
    _check_against_reference(
        "reference_disp_64.npz",
        ConvexAdamConfig(
            mind_r=1, mind_d=2, lambda_weight=1.25, grid_sp=4, disp_hw=3,
            selected_niter=40, selected_smooth=0, grid_sp_adam=2, ic=True,
            dtype="float32",
        ),
    )


def test_field_matches_reference_smooth_path():
    """Reference run: mind_r=2, mind_d=1, lambda_weight=0.65, grid_sp=4,
    disp_hw=2, selected_niter=24, selected_smooth=3, grid_sp_adam=2,
    ic=True (covers the output-smoothing branch and non-default MIND
    radius/dilation; measured cross-impl EPE p95 = 0.0003 voxels).

    The ic=False branch is deliberately NOT pointwise-comparable: the
    reference feeds the coarse grid_sp-unit field straight into the Adam
    stage there (convex_adam_MIND.py:144 — the unit bug its own challenge
    scripts avoid), which this framework intentionally fixes (see
    pipeline/convex_adam.py module docstring).
    test_noic_deviation_recovers_transform below pins that the fixed
    branch still recovers the transform."""
    _check_against_reference(
        "reference_disp_64_smooth.npz",
        ConvexAdamConfig(
            mind_r=2, mind_d=1, lambda_weight=0.65, grid_sp=4, disp_hw=2,
            selected_niter=24, selected_smooth=3, grid_sp_adam=2, ic=True,
            dtype="float32",
        ),
    )


def test_noic_deviation_recovers_transform():
    """With ic=False we deviate from the reference by design (its coarse
    field enters Adam in grid_sp units, convex_adam_MIND.py:144); the fix
    must still recover the synthetic transform to sub-voxel accuracy."""
    vol, mov = _case(11, (-2, 3, 1))
    cfg = ConvexAdamConfig(
        mind_r=2, mind_d=1, lambda_weight=0.65, grid_sp=6, disp_hw=2,
        selected_niter=24, selected_smooth=0, grid_sp_adam=3, ic=False,
        dtype="float32",
    )
    ours = np.asarray(
        convex_adam_jax(jnp.asarray(vol), jnp.asarray(mov), cfg), np.float32
    )
    c = 12
    err = np.abs(
        ours[c:-c, c:-c, c:-c] - np.array([-2, 3, 1], np.float32)
    )
    assert np.mean(np.all(err < 1.0, axis=-1)) > 0.85


def test_semantic_pipeline_matches_reference_within_tiebreak_envelope():
    """The nnU-Net semantic pipeline against a field produced by the
    UNMODIFIED reference (convex_adam_nnUNet.py:41-159, run on torch CPU
    with .cuda()/.half() patched to identity/float — the pipeline is
    otherwise device-agnostic).

    The weighted one-hot features agree to float ulps (measured 9.5e-7);
    the residual field difference (p50 0.008 / p95 0.254 voxels measured)
    is the argmin-tie-break + flat-landscape envelope inherent to one-hot
    features (see test_reference_sweep_parity for the same phenomenon and
    PARITY.md for the analysis); registration quality must be equal."""
    from convexadam_tpu.core.metrics import dice_coeff
    from convexadam_tpu.pipeline.convex_adam import convex_adam_semantic_jax

    ref = np.load(_HERE / "reference_semantic_48.npz")
    cfg = ConvexAdamConfig(
        lambda_weight=0.65, grid_sp=3, disp_hw=2, selected_niter=12,
        selected_smooth=0, grid_sp_adam=2, ic=True, dtype="float32",
    )
    ours = np.asarray(
        convex_adam_semantic_jax(
            jnp.asarray(ref["seg_f"]), jnp.asarray(ref["seg_m"]), cfg,
            num_labels=3,
        ),
        np.float32,
    )
    rd = ref["disp"].astype(np.float32)
    epe = np.sqrt(((ours - rd) ** 2).sum(-1))
    if jax.default_backend() == "cpu":
        assert np.mean(epe) < 0.1, np.mean(epe)
        assert np.percentile(epe, 95) < 0.5, np.percentile(epe, 95)
    else:
        # the chip's bf16 MXU accumulation flips more one-hot cost ties
        # than CPU op-order does, and the flat-landscape Adam stage
        # amplifies them (measured on-chip: mean 0.24 / p95 1.1 voxels);
        # registration QUALITY equality below stays strict
        assert np.mean(epe) < 0.5, np.mean(epe)
        assert np.percentile(epe, 95) < 2.0, np.percentile(epe, 95)

    def dice_with(field):
        warped = np.asarray(
            warp_with_displacement(
                jnp.asarray(ref["seg_m"], jnp.float32)[None],
                jnp.moveaxis(jnp.asarray(field), -1, 0),
                mode="nearest",
            )[0]
        ).round().astype(np.int32)
        return float(
            np.asarray(
                dice_coeff(jnp.asarray(ref["seg_f"]), jnp.asarray(warped), 3)
            ).mean()
        )

    assert abs(dice_with(ours) - dice_with(rd)) < 0.01


def test_deformable_ground_truth_recovery_matches_reference():
    """Deformable (non-rigid) ground truth: ``fixed = warp(base, phi)`` for
    a known smooth 3-voxel-scale field phi, ``moving = base`` — the true
    displacement is exactly phi.  The fixture stores the case AND the
    unmodified reference's recovered field (torch CPU f32, 60 iters).

    Asserts (a) our field agrees with the reference's pointwise (p95 <
    0.1 voxels; measured 0.031), and (b) our ground-truth recovery error is
    no worse than the reference's (measured identical: mean 0.778 voxels on
    a |phi|-mean-2.48 field of smooth featureless noise)."""
    ref = np.load(_HERE / "reference_deformable_64.npz")
    cfg = ConvexAdamConfig(
        mind_r=1, mind_d=2, lambda_weight=1.25, grid_sp=4, disp_hw=3,
        selected_niter=60, selected_smooth=0, grid_sp_adam=2, ic=True,
        dtype="float32",
    )
    ours = np.asarray(
        convex_adam_jax(jnp.asarray(ref["fixed"]), jnp.asarray(ref["moving"]), cfg),
        np.float32,
    )
    cross = np.sqrt(((ours - ref["disp_ref"]) ** 2).sum(-1))
    assert np.percentile(cross, 95) < 0.1, np.percentile(cross, 95)

    gt = ref["gt"]
    c = 8
    err_ours = np.sqrt(((ours - gt) ** 2).sum(-1))[c:-c, c:-c, c:-c].mean()
    err_ref = np.sqrt(
        ((ref["disp_ref"] - gt) ** 2).sum(-1)
    )[c:-c, c:-c, c:-c].mean()
    assert err_ours <= err_ref + 0.02, (err_ours, err_ref)
