"""Dense discretised SSD cost volume ("correlation layer").

Reference: ``correlate`` (src/convexAdam/convex_adam_utils.py:72-89).  For a
displacement half-width ``q = disp_hw`` it evaluates, at every coarse-grid
voxel ``n``, the channel-summed SSD between the fixed features at ``n`` and
the moving features at ``n + k`` for all ``(2q+1)**3`` integer displacements
``k`` (zero padding outside), then smooths each displacement slice with a
double 3x3x3 zero-padded box filter.

Displacement-axis layout (must match the reference's argmin/mesh contract,
convex_adam_utils.py:86 and convex_adam_MIND.py:127): the flattened index is
``k = kd*K**2 + kw*K + kh`` with ``K = 2q+1`` and ``kh/kw/kd`` the shift
indices along H/W/D (shift = index - q).

TPU-native design: instead of torch's giant ``F.unfold`` buffer, a
``lax.scan`` over the K**3 displacements dynamic-slices the zero-padded
moving features — constant memory, and XLA fuses the subtract/square/
channel-sum into a single VPU pass per step.  The box filters run batched
over the displacement axis as separable reduce_windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from convexadam_tpu.core.smoothing import avg_pool3d


def displacement_mesh(disp_hw: int, dtype=jnp.float32) -> jax.Array:
    """Integer displacement mesh (3, K**3) in voxel units, channels in array
    order (dH, dW, dD), flat index ``kd*K**2 + kw*K + kh``.

    Equals the reference's ``disp_mesh_t``
    (``F.affine_grid(disp_hw*eye, (1,1,K,K,K), align_corners=True)`` then
    permute/reshape, convex_adam_MIND.py:127) after accounting for torch's
    (x, y, z) channel reversal.
    """
    q = disp_hw
    r = np.arange(-q, q + 1, dtype=np.float32)
    dd, dw, dh = np.meshgrid(r, r, r, indexing="ij")  # flat order (kd, kw, kh)
    mesh = np.stack([dh.ravel(), dw.ravel(), dd.ravel()], axis=0)
    return jnp.asarray(mesh, dtype=dtype)


@functools.partial(
    jax.jit, static_argnames=("disp_hw", "compute_dtype", "metric", "smooth_passes")
)
def correlate(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hw: int,
    compute_dtype=jnp.float32,
    metric: str = "ssd",
    smooth_passes: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Dense cost volume.

    Args:
      feat_fix, feat_mov: (C, H', W', D') coarse-grid features.
      disp_hw: displacement half-width ``q`` (static).
      metric: "ssd" (default) or "sad" (the OASIS task-3 script uses absolute
        differences, l2r_2021_convexAdam_task3_docker.py:54).
      smooth_passes: number of 3^3 box-filter passes (2 in the packaged
        pipeline, 1 in the lung task-2 script,
        l2r_2021_convexAdam_task2_docker.py:60).

    Returns:
      ssd: (K**3, H', W', D') box-smoothed cost volume (layout above).
      ssd_argmin: (H', W', D') int32 argmin over the displacement axis.
    """
    q = disp_hw
    K = 2 * q + 1
    C, H, W, D = feat_fix.shape

    # TPU fast path: the fused Pallas kernel keeps both feature volumes in
    # VMEM across the displacement sweep (~3.6x faster than the XLA scan on
    # v5e); falls through to XLA for non-SSD metrics, large coarse grids, or
    # non-TPU backends.
    #
    # bf16 VMEM tiling (ROADMAP's "remaining idea") is MEASURED DEAD:
    # feeding bf16 features would be bitwise-identical (the kernel upcasts
    # before the arithmetic — pinned by
    # test_pallas_cost_volume_bf16_feed_bitwise_equals_f32_cast), but
    # Mosaic cannot start the kw-shifted DMA window at unaligned sublane
    # offsets under the packed (8,128)(2,1) bf16 tiling ("Failed to prove
    # that a tile index in dimension 2 is divisible by the tiling (8)" on
    # the real chip), and the bound on the win is ~0.3 ms/direction at
    # bench shapes: the kernel's traffic is dominated by the f32 cost
    # volume itself (~95 MB out + box-filter passes), while bf16 halves
    # only the ~150 MB of repeated feature-block DMA — <0.1% end to end.
    # Restructuring the kernel for aligned DMA (kw unrolled in-kernel)
    # cannot pay for itself.
    if (
        metric == "ssd"
        and jax.default_backend() == "tpu"
        and compute_dtype == jnp.float32
    ):
        from convexadam_tpu.ops.cost_volume_pallas import (  # noqa: PLC0415
            cost_volume_pallas_batchable,
            fits_vmem,
        )

        if fits_vmem(feat_fix.shape, q, 4):
            ssd = cost_volume_pallas_batchable(
                feat_fix.astype(jnp.float32), feat_mov.astype(jnp.float32), q
            )
            for _ in range(smooth_passes):
                ssd = avg_pool3d(ssd, 3, stride=1, padding=1)
            return ssd, jnp.argmin(ssd, axis=0).astype(jnp.int32)

    fix = feat_fix.astype(compute_dtype)
    movp = jnp.pad(
        feat_mov.astype(compute_dtype),
        ((0, 0), (q, q), (q, q), (q, q)),
        mode="constant",
    )

    # flat index k = kd*K^2 + kw*K + kh → slice offsets per step
    ks = np.arange(K**3)
    offs = np.stack([ks % K, (ks // K) % K, ks // (K * K)], axis=1)  # (K^3, 3) = (kh, kw, kd)
    offs = jnp.asarray(offs, dtype=jnp.int32)

    def body(_, off):
        sl = lax.dynamic_slice(movp, (0, off[0], off[1], off[2]), (C, H, W, D))
        d = fix - sl
        cost = jnp.abs(d) if metric == "sad" else d * d
        return None, jnp.sum(cost, axis=0)

    _, ssd = lax.scan(body, None, offs)  # (K^3, H, W, D)

    for _ in range(smooth_passes):
        ssd = avg_pool3d(ssd, 3, stride=1, padding=1)
    return ssd, jnp.argmin(ssd, axis=0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("disp_hw", "compute_dtype"))
def correlate_masked(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    mask: jax.Array,
    disp_hw: int,
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Cost volume gated by a coarse-grid mask (``ssd *= mask``), as used by
    the CuRIOUS MRI-US pipeline (l2r_2020_convexAdam_CuRIOUS.py:336,349)."""
    ssd, _ = correlate(feat_fix, feat_mov, disp_hw, compute_dtype)
    ssd = ssd * mask.astype(ssd.dtype)[None]
    return ssd, jnp.argmin(ssd, axis=0).astype(jnp.int32)
