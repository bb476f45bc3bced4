"""Evaluation metrics: Dice, HD95, Jacobian determinant, keypoint TRE,
3D SSIM, and rank aggregation.

The reference has no single metrics module — these live in
self_configuring/convexAdam_hyper_util.py (dice :53-60, cupy HD95 :32-51,
jacobian :86-108, sort_rank :28-31), the sweep scripts (TRE,
convex_run_paired_mind.py:167-181) and the tests (3D SSIM,
tests/helper_functions.py:100-145).  Here they are one jit/vmap-safe module
so the sweep engine can evaluate on-device; only HD95's distance transform
runs on host (as the reference's cupy EDT effectively does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.warp import (
    grid_sample_3d,
)


# ---------------------------------------------------------------------------
# Dice
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_label",))
def dice_coeff(outputs: jax.Array, labels: jax.Array, max_label: int) -> jax.Array:
    """Per-label Dice for labels 1..max_label-1
    (convexAdam_hyper_util.py:53-60): 2·mean(i∧t) / (1e-8 + mean(i) + mean(t))."""
    o = outputs.reshape(-1)
    t = labels.reshape(-1)
    labs = jnp.arange(1, max_label)

    def one(lab):
        i = (o == lab).astype(jnp.float32)
        tt = (t == lab).astype(jnp.float32)
        inter = jnp.mean(i * tt)
        return 2.0 * inter / (1e-8 + jnp.mean(i) + jnp.mean(tt))

    return jax.vmap(one)(labs)


# ---------------------------------------------------------------------------
# HD95 (95th percentile Hausdorff) — host-side EDT like the reference's cupy
# ---------------------------------------------------------------------------

def hd95(
    fixed: np.ndarray, moving: np.ndarray, num_labels: int, missing_value: float = 30.0
) -> np.ndarray:
    """Per-label HD95 between label volumes, reference semantics
    (convexAdam_hyper_util.py:32-51): surfaces are voxels at interior
    distance exactly 1; distance maps are interior+exterior EDT sums; a label
    missing from either volume scores ``missing_value`` (30)."""
    from convexadam_tpu.utils.edt import edt_distance

    out = np.zeros(num_labels, np.float64)
    for i in range(1, num_labels + 1):
        f = (fixed == i).astype(np.uint8)
        m = (moving == i).astype(np.uint8)
        if f.sum() > 0 and m.sum() > 0:
            dist1 = edt_distance(f)
            surf1 = dist1 == 1
            dist1 = dist1 + edt_distance(1 - f)
            dist2 = edt_distance(m)
            surf2 = dist2 == 1
            dist2 = dist2 + edt_distance(1 - m)
            out[i - 1] = max(
                np.percentile(dist1[surf2], 95), np.percentile(dist2[surf1], 95)
            )
        else:
            out[i - 1] = missing_value
    return out


# ---------------------------------------------------------------------------
# Jacobian determinant
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("normalized",))
def jacobian_determinant(disp: jax.Array, normalized: bool = False) -> jax.Array:
    """Jacobian determinant of ``id + disp`` via central differences, with a
    2-voxel crop (convexAdam_hyper_util.py:86-108).

    ``disp`` is (3, H, W, D); with ``normalized=True`` the field is in
    normalized [-1,1] units and is converted by (n-1)/2 per channel first
    (the reference's ``convert1``).
    """
    H, W, D = disp.shape[1:]
    if normalized:
        scale = jnp.array(
            [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], disp.dtype
        ).reshape(3, 1, 1, 1)
        disp = disp * scale

    def central(x, axis):
        # conv weight [-0.5, 0, 0.5] with zero padding, as the reference's
        # grouped conv3d with padding=1
        xp = jnp.pad(
            x, [(0, 0)] + [(1, 1) if a == axis else (0, 0) for a in range(3)]
        )
        sl_hi = [slice(None)] * 4
        sl_lo = [slice(None)] * 4
        sl_hi[1 + axis] = slice(2, 2 + x.shape[1 + axis])
        sl_lo[1 + axis] = slice(0, x.shape[1 + axis])
        # reference kernel [-0.5, 0, 0.5] correlated: out = 0.5*(x[i+1]) - 0.5*(x[i-1])
        return 0.5 * xp[tuple(sl_hi)] - 0.5 * xp[tuple(sl_lo)]

    grad_h = central(disp, 0)  # d(disp)/dH — (3, H, W, D)
    grad_w = central(disp, 1)
    grad_d = central(disp, 2)
    # J[a][b] = d(disp_a)/d(axis_b) + I
    J = jnp.stack([grad_h, grad_w, grad_d], axis=1)  # (3 comp, 3 deriv, H, W, D)
    eye = jnp.eye(3, dtype=disp.dtype).reshape(3, 3, 1, 1, 1)
    J = J + eye
    J = J[:, :, 2:-2, 2:-2, 2:-2]
    det = (
        J[0, 0] * (J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1])
        - J[1, 0] * (J[0, 1] * J[2, 2] - J[0, 2] * J[2, 1])
        + J[2, 0] * (J[0, 1] * J[1, 2] - J[0, 2] * J[1, 1])
    )
    return det


def sd_log_jacobian(
    disp: jax.Array, normalized: bool = False, offset: float = 3.0
) -> jax.Array:
    """Std of log(det J + offset) — the sweep scripts' stabilized SDlogJ
    (convex_run_withconfig.py:150: ``jac_det.add(3).clamp_(1e-9,1e9).log().std()``).
    Use ``offset=0`` (with the clamp) for the plain L2R SDlogJ."""
    det = jacobian_determinant(disp, normalized=normalized)
    return jnp.std(jnp.log(jnp.clip(det + offset, 0.000000001, 1000000000.0)))


def negative_jacobian_fraction(
    disp: jax.Array, normalized: bool = False
) -> jax.Array:
    """Fraction of voxels with det J < 0 (convex_run_withconfig.py:152)."""
    det = jacobian_determinant(disp, normalized=normalized)
    return jnp.mean((det < 0).astype(jnp.float32))


# ---------------------------------------------------------------------------
# Keypoint TRE
# ---------------------------------------------------------------------------

def keypoint_tre(
    disp: jax.Array,
    kpts_fixed: jax.Array,
    kpts_moving: jax.Array,
    spacing=None,
) -> jax.Array:
    """Target registration error at keypoints.

    ``disp`` is (3, H, W, D) voxel displacements; keypoints are (N, 3) voxel
    coords in the fixed image (array order).  Mirrors
    convex_run_paired_mind.py:167-175: the field is sampled at the keypoints
    normalized with the align_corners=True formula ``k/((n-1)/2) - 1`` but
    interpolated with grid_sample defaults (align_corners=False) — the
    reference's deliberate convention mix — and
    ``TRE = ||k_fix - k_mov + disp(k_fix)||`` in voxel units (optionally
    scaled by ``spacing`` per axis).
    """
    H, W, D = disp.shape[1:]
    scale = jnp.array([(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], disp.dtype)
    g = kpts_fixed / scale - 1.0
    sampled = grid_sample_3d(disp, g.reshape(-1, 1, 1, 3), align_corners=False)
    sampled = sampled.reshape(3, -1).T  # (N, 3)
    err = kpts_fixed - kpts_moving + sampled
    if spacing is not None:
        err = err * spacing
    return jnp.sqrt(jnp.sum(err * err, axis=1))


# ---------------------------------------------------------------------------
# 3D SSIM (test-metric parity: tests/helper_functions.py:100-145)
# ---------------------------------------------------------------------------

def _ssim_gauss_filter(v: jax.Array, window_size: int, sigma: float) -> jax.Array:
    """Separable normalized-Gaussian filter with zero padding — the window
    of the reference's pytorch-ssim-3D helper
    (tests/helper_functions.py:102-117)."""
    r = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(r**2) / (2.0 * sigma**2))
    g = jnp.asarray(g / g.sum())
    out = v
    for ax in range(3):
        shape = [1, 1, 1]
        shape[ax] = window_size
        pad = [(0, 0)] * 3
        pad[ax] = (window_size // 2, window_size // 2)
        out = jax.lax.conv_general_dilated(
            out[None, None],
            g.reshape([1, 1] + shape),
            window_strides=(1, 1, 1),
            padding=pad,
        )[0, 0]
    return out


def ssim3d(
    x: jax.Array, y: jax.Array, window_size: int = 11, sigma: float = 1.5
) -> jax.Array:
    """Mean 3D SSIM with the reference's Gaussian window (σ=1.5,
    zero-padded; tests/helper_functions.py:100-145); data range normalized
    from the joint min/max (the reference helper assumes [0, 1] inputs)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    lo = jnp.minimum(x.min(), y.min())
    hi = jnp.maximum(x.max(), y.max())
    x = (x - lo) / (hi - lo + 1e-12)
    y = (y - lo) / (hi - lo + 1e-12)
    c1, c2 = 0.01**2, 0.03**2

    def f(v):
        return _ssim_gauss_filter(v, window_size, sigma)

    mx, my = f(x), f(y)
    sxx = f(x * x) - mx * mx
    syy = f(y * y) - my * my
    sxy = f(x * y) - mx * my
    ssim_map = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
        (mx * mx + my * my + c1) * (sxx + syy + c2)
    )
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# Rank aggregation
# ---------------------------------------------------------------------------

def sort_rank(values: np.ndarray) -> np.ndarray:
    """Normalized rank in [0.1, 1]: the SMALLEST value gets 1.0, the largest
    0.1 (convexAdam_hyper_util.py:28-31 — rank1[argsort] = linspace(1, .1)),
    so bigger-is-better metrics (dice) must be NEGATED by the caller; the
    sweep engines do (e.g. selfconfig/engine.py sort_rank(-flat_dice))."""
    values = np.asarray(values, np.float64)
    n = len(values)
    rank = np.empty(n)
    rank[np.argsort(values)] = np.linspace(1.0, 0.1, n)
    return rank


def rank_product(metric_ranks: list[np.ndarray]) -> np.ndarray:
    """Geometric mean of per-metric normalized ranks
    (convex_run_withconfig.py:162-172)."""
    prod = np.ones_like(metric_ranks[0])
    for r in metric_ranks:
        prod = prod * r
    return prod ** (1.0 / len(metric_ranks))
