"""Fused Pallas TPU kernel for the dense SSD cost volume.

The reference's ``correlate`` (convex_adam_utils.py:72-89) is this method's
signature op: at every coarse voxel, channel-summed SSD against all
``(2q+1)^3`` shifted views of the moving features.  The XLA fallback
(core/cost_volume.py) scans the displacements with dynamic slices, re-reading
both feature volumes from HBM on every step (~2.3 GB of traffic at default
settings).  Coarse feature volumes are small (12 x 32^3 fp32 ≈ 1.6 MB at the
default grid_sp=6), so this kernel keeps BOTH volumes resident in VMEM across
the whole displacement sweep and streams only the cost volume out — one HBM
read of the features total.

Grid: one program per (kh, kd) shift pair; each program computes the K
in-plane ``kw`` shifts with static slices (pure VPU work) and writes its
(K, h, w, d) slab.  Falls back to the XLA path when the volumes don't fit
VMEM (large coarse grids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convexadam_tpu.core.smoothing import avg_pool3d


def _cost_kernel(fix_ref, movp_hbm, out_ref, slab, sem, *, K, C, TH, w, d, q):
    # grid = (ih, kw, kh), kh innermost.  The persistent VMEM scratch holds
    # the (C, TH+2q, w, d_pad) superslab covering ALL kh shifts of this
    # (ih, kw) pair — DMA'd once when kh == 0 (dynamic DMA starts have no
    # vector-alignment constraints).  kh then slices the slab's major dim
    # (unconstrained) and the minor-dim shift kd is a static unrolled loop.
    ih = pl.program_id(0)
    kw = pl.program_id(1)
    kh = pl.program_id(2)

    @pl.when(kh == 0)
    def _():
        cp = pltpu.make_async_copy(
            movp_hbm.at[:, pl.ds(ih * TH, TH + 2 * q), pl.ds(kw, w), :],
            slab,
            sem,
        )
        cp.start()
        cp.wait()

    fix = fix_ref[...].astype(jnp.float32)
    rows = slab[:, pl.ds(kh, TH), :, :]
    for kd in range(K):
        diff = fix - rows[:, :, :, kd : kd + d].astype(jnp.float32)
        out_ref[0, 0, kd] = jnp.sum(diff * diff, axis=0)


def _pick_tile_h(feat_shape, disp_hw: int, dtype_bytes: int):
    """Largest H-tile whose VMEM footprint (scratch slab + double-buffered
    fix/out blocks, lane dim padded to 128) stays within budget; None if
    even TH=1 doesn't fit (→ XLA fallback)."""
    C, h, w, d = feat_shape
    q = disp_hw
    K = 2 * q + 1
    # sublane-dim sizes that aren't multiples of the dtype's native tile
    # (8 for f32, 16 for bf16) fault at runtime in Mosaic's masked edge
    # handling (observed with 12^3 coarse grids) — leave those to XLA
    sub = 8 * (4 // dtype_bytes)
    if h % 8 or w % sub:
        return None
    d_pad = -(-(d + 2 * q) // 128) * 128
    d_lane = -(-d // 128) * 128
    budget = 10 * 1024 * 1024
    # TH=8 ONLY: smaller H-tiles make the slab DMA's dim-1 window start at
    # non-8-aligned offsets (ih*TH), and Mosaic rejects the program
    # ("Failed to prove that a tile index in dimension 2 is divisible by
    # the tiling (8)" — observed on-chip at (14, 96, 80, 128) q=2, where
    # the VMEM budget forced TH=2; every previously validated shape had
    # TH=8).  Shapes that don't fit at TH=8 take the XLA scan.
    for TH in (8,):
        if h % TH:
            continue
        scratch = C * (TH + 2 * q) * w * d_pad * dtype_bytes
        fix = 2 * C * TH * w * d_lane * dtype_bytes
        out = 2 * K * TH * w * d_lane * 4
        if scratch + fix + out <= budget:
            return TH
    return None


def fits_vmem(feat_shape, disp_hw: int, dtype_bytes: int = 4) -> bool:
    return _pick_tile_h(feat_shape, disp_hw, dtype_bytes) is not None


@functools.partial(jax.jit, static_argnames=("disp_hw", "interpret"))
def cost_volume_pallas(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hw: int,
    interpret: bool = False,
) -> jax.Array:
    """Unsmoothed SSD cost volume (K^3, h, w, d), reference layout
    ``k = kd*K^2 + kw*K + kh`` (zero padding outside the moving volume).

    Equals the pre-box-filter volume of core.cost_volume.correlate (computed
    in f32 from the incoming feature dtype); the caller applies the double
    3^3 box filter + argmin epilogue.
    """
    q = disp_hw
    K = 2 * q + 1
    C, h, w, d = feat_fix.shape
    TH = _pick_tile_h(feat_fix.shape, q, feat_fix.dtype.itemsize)
    if TH is None:
        raise ValueError("volume too large for VMEM; use the XLA correlate")
    # lane (minor) dim padded to a 128 multiple so VMEM DMA slices are
    # tiling-aligned; the extra columns are never read (kd + d <= d + 2q)
    d_pad = -(-(d + 2 * q) // 128) * 128
    movp = jnp.pad(
        feat_mov, ((0, 0), (q, q), (q, q), (q, d_pad - d - q))
    )

    kernel = functools.partial(_cost_kernel, K=K, C=C, TH=TH, w=w, d=d, q=q)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, K, K, h, w, d), jnp.float32),
        grid=(h // TH, K, K),
        in_specs=[
            pl.BlockSpec(
                (C, TH, w, d),
                lambda ih, kw, kh: (0, ih, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, K, TH, w, d),
            lambda ih, kw, kh: (kh, kw, 0, ih, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((C, TH + 2 * q, w, d_pad), movp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(feat_fix, movp)
    # out[kh, kw, kd] → flat k = kd*K^2 + kw*K + kh
    out = jnp.transpose(out, (2, 1, 0, 3, 4, 5))  # (kd, kw, kh, ...)
    return out.reshape(K**3, h, w, d)


# pallas_call with manual DMA doesn't batch under vmap — provide a
# custom_vmap wrapper that maps the kernel sequentially over the batch
# (sweep engines vmap the whole pipeline over case pairs; the kernel already
# saturates the chip per pair, so sequential mapping costs nothing).
_CVP_CACHE: dict = {}


def cost_volume_pallas_batchable(feat_fix, feat_mov, disp_hw: int):
    if disp_hw not in _CVP_CACHE:

        @jax.custom_batching.custom_vmap
        def _cvp(fix, mov):
            return cost_volume_pallas(fix, mov, disp_hw)

        @_cvp.def_vmap
        def _cvp_vmap(axis_size, in_batched, fix, mov):
            fix_b, mov_b = in_batched
            if not fix_b:
                fix = jnp.broadcast_to(fix, (axis_size,) + fix.shape)
            if not mov_b:
                mov = jnp.broadcast_to(mov, (axis_size,) + mov.shape)
            out = jax.lax.map(lambda fm: _cvp(fm[0], fm[1]), (fix, mov))
            return out, True

        _CVP_CACHE[disp_hw] = _cvp
    return _CVP_CACHE[disp_hw](feat_fix, feat_mov)


@functools.partial(jax.jit, static_argnames=("disp_hw", "interpret"))
def correlate_pallas(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hw: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in Pallas-backed equivalent of core.cost_volume.correlate
    (ssd metric, two box-filter passes)."""
    ssd = cost_volume_pallas(feat_fix, feat_mov, disp_hw, interpret=interpret)
    ssd = avg_pool3d(ssd, 3, stride=1, padding=1)
    ssd = avg_pool3d(ssd, 3, stride=1, padding=1)
    return ssd, jnp.argmin(ssd, axis=0).astype(jnp.int32)
