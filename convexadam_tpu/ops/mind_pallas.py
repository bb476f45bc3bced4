"""Fused Pallas TPU kernel for the MIND-SSC descriptor's heavy stages.

Reference hot path: ``MINDSSC`` (src/convexAdam/convex_adam_utils.py:24-68).
The XLA path (core/features.py) streams the (12, H, W, D) shift-difference
volume through a separable replicate-padded box filter and channel
min/variance reductions — several full HBM passes over the 12-channel data.
This kernel computes, per (TH, TW, D) output tile held in VMEM:

  1. the 12 shift-pair squared differences (H/W shifts read from a DMA'd
     halo window; D shifts are replicate-clamped static concats),
  2. the (2r+1)^3 replicate-padded box filter,
  3. the channel min-subtraction (``mind = ssd - min_c ssd``) and the
     channel-mean variance map (f32),

writing only ``mind`` and ``var`` — the input volume is read ~2x (halo
overlap) instead of the 12-channel volume being re-streamed ~6x.  The
variance clamp needs the GLOBAL mean of ``var`` (convex_adam_utils.py:61),
so the tiny ``exp(-mind / clamp(var, gm...))`` epilogue stays in XLA (one
fused pass).

Boundary semantics: the replicate padding applies to the DIFFERENCE array
(``replicate(diff) != diff(replicate(img))`` — the round-1 blocker); the
kernel computes diffs on an edge-padded input window and then overwrites
the out-of-volume halo rows/cols of the diff tile with their clamped
in-volume neighbours (predicated static-index writes), which is exactly
the separable clamp the XLA path's ``jnp.pad(mode='edge')`` performs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convexadam_tpu.core.features import _mind_shift_pairs


def _dshift_replicate(t: jax.Array, o: int) -> jax.Array:
    """Shift along the last (D) axis with replicate clamp (the volume's D
    extent is never tiled, so tile edge == volume edge)."""
    if o == 0:
        return t
    if o > 0:
        edge = jnp.concatenate([t[..., -1:]] * o, axis=-1)
        return jnp.concatenate([t[..., o:], edge], axis=-1)
    edge = jnp.concatenate([t[..., :1]] * (-o), axis=-1)
    return jnp.concatenate([edge, t[..., :o]], axis=-1)


def _mind_kernel(
    xp_hbm, mind_ref, var_ref, slab, d2_ref, sem,
    *, offs_pairs, r, TH, TW, H, W, D, b,
):
    ih = pl.program_id(0)
    iw = pl.program_id(1)
    n_ih = pl.num_programs(0)
    n_iw = pl.num_programs(1)
    k = 2 * r + 1

    # Mosaic DMA alignment: the window's sublane (dim-1) extent must be an
    # 8-multiple and the lane (dim-2) extent a 128-multiple — the slab is
    # padded up on both and the extra columns/lanes are never read
    TWB_pad = slab.shape[1]
    cp = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(ih * TH, TH + 2 * b), pl.ds(iw * TW, TWB_pad), :],
        slab,
        sem,
    )
    cp.start()
    cp.wait()
    x = slab[...][:, :, :D]

    ssd = []
    for (o1, o2) in offs_pairs:
        # diff region rows/cols [b-r, b+TH+r) x [b-r, b+TW+r), full D
        r0, c0 = b - r, b - r
        a = _dshift_replicate(
            x[r0 + o1[0]: r0 + o1[0] + TH + 2 * r,
              c0 + o1[1]: c0 + o1[1] + TW + 2 * r, :],
            o1[2],
        )
        bb = _dshift_replicate(
            x[r0 + o2[0]: r0 + o2[0] + TH + 2 * r,
              c0 + o2[1]: c0 + o2[1] + TW + 2 * r, :],
            o2[2],
        )
        d = a - bb
        d2_ref[...] = d * d

        # replicate-clamp the halo rows/cols that fall outside the volume
        # (only boundary tiles; the diff array is clamped, not the image)
        for j in range(r):
            @pl.when(ih == 0)
            def _():
                d2_ref[j] = d2_ref[r]

            @pl.when(ih == n_ih - 1)
            def _():
                d2_ref[TH + 2 * r - 1 - j] = d2_ref[TH + r - 1]

            @pl.when(iw == 0)
            def _():
                d2_ref[:, j] = d2_ref[:, r]

            @pl.when(iw == n_iw - 1)
            def _():
                d2_ref[:, TW + 2 * r - 1 - j] = d2_ref[:, TW + r - 1]

        s = d2_ref[...]
        # separable box sums, same axis order and j-ascending addition as
        # the XLA path (core/smoothing.py:_reduce_window_sum_axis)
        acc = s[0: TH, :, :]
        for j in range(1, k):
            acc = acc + s[j: j + TH, :, :]
        acc2 = acc[:, 0: TW, :]
        for j in range(1, k):
            acc2 = acc2 + acc[:, j: j + TW, :]
        # D axis: replicate-pad by r then windowed sum
        left = jnp.concatenate([acc2[..., :1]] * r, axis=-1) if r else None
        right = jnp.concatenate([acc2[..., -1:]] * r, axis=-1) if r else None
        sd = jnp.concatenate([left, acc2, right], axis=-1) if r else acc2
        acc3 = sd[..., 0: D]
        for j in range(1, k):
            acc3 = acc3 + sd[..., j: j + D]
        ssd.append(acc3 / float(k**3))

    ssd_min = ssd[0]
    for c in range(1, len(ssd)):
        ssd_min = jnp.minimum(ssd_min, ssd[c])
    var = None
    for c, s_c in enumerate(ssd):
        m = s_c - ssd_min
        mind_ref[c] = m
        v = m.astype(jnp.float32)
        var = v if var is None else var + v
    var_ref[...] = var / float(len(ssd))


def _pick_tiles(H: int, W: int):
    for t in (16, 8):
        if H % t == 0 and W % t == 0:
            return t, t
    return None


def mind_supported(shape, radius: int, dilation: int, itemsize: int) -> bool:
    """Cheap feasibility check: tile divisibility + VMEM budget."""
    H, W, D = shape
    t = _pick_tiles(H, W)
    if t is None:
        return False
    TH, TW = t
    b = radius + dilation
    slab = (TH + 2 * b) * (TW + 2 * b) * D * itemsize
    d2 = (TH + 2 * radius) * (TW + 2 * radius) * D * itemsize
    ssd12 = 12 * TH * TW * D * 4
    out = 2 * (12 * TH * TW * D * itemsize + TH * TW * D * 4)
    return slab + d2 + ssd12 + out < 10 * 1024 * 1024


# custom_vmap wrapper mapping the kernel sequentially over a batch (the
# sweep/batch engines vmap whole pipelines over case pairs; the MIND kernel
# saturates the chip per volume, so sequential mapping costs nothing — and
# the kernel's ANY-memory-space input forbids the default pallas batching
# rule's block-spec extension).
_MSP_CACHE: dict = {}


def mind_ssd_stats_batchable(
    img, radius: int, dilation: int, interpret: bool = False
):
    key = (radius, dilation, interpret)
    if key not in _MSP_CACHE:

        @jax.custom_batching.custom_vmap
        def _msp(x):
            return mind_ssd_stats_pallas(x, radius, dilation, interpret)

        @_msp.def_vmap
        def _msp_vmap(axis_size, in_batched, x):
            if not in_batched[0]:
                x = jnp.broadcast_to(x, (axis_size,) + x.shape)
            out = jax.lax.map(_msp, x)
            return out, (True, True)

        _MSP_CACHE[key] = _msp
    return _MSP_CACHE[key](img)


@functools.partial(
    jax.jit, static_argnames=("radius", "dilation", "interpret")
)
def mind_ssd_stats_pallas(
    img: jax.Array,
    radius: int = 2,
    dilation: int = 2,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(mind, var): ``mind = boxfilter(diff^2) - min_c`` (12, H, W, D) in the
    input dtype and ``var = mean_c(mind)`` (H, W, D) f32 — everything of
    MINDSSC up to (exclusive) the global-mean variance clamp."""
    H, W, D = img.shape
    TH, TW = _pick_tiles(H, W)
    b = radius + dilation
    r = radius

    pairs = _mind_shift_pairs()
    offs_pairs = [
        (
            tuple((c - 1) * dilation for c in s1),
            tuple((c - 1) * dilation for c in s2),
        )
        for (s1, s2) in pairs
    ]

    # Mosaic DMA alignment: round the window width up to an 8-multiple and
    # the lane extent up to a 128-multiple, edge-padding the input so every
    # tile's (possibly oversized) window exists
    TWB = TW + 2 * b
    TWB_pad = -(-TWB // 8) * 8
    D_pad = -(-D // 128) * 128
    xp = jnp.pad(
        img,
        ((b, b), (b, b + (TWB_pad - TWB)), (0, D_pad - D)),
        mode="edge",
    )
    kernel = functools.partial(
        _mind_kernel, offs_pairs=tuple(offs_pairs), r=r,
        TH=TH, TW=TW, H=H, W=W, D=D, b=b,
    )
    mind, var = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((12, H, W, D), img.dtype),
            jax.ShapeDtypeStruct((H, W, D), jnp.float32),
        ),
        grid=(H // TH, W // TW),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(
                (12, TH, TW, D), lambda i, j: (0, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TH, TW, D), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * b, TWB_pad, D_pad), img.dtype),
            pltpu.VMEM((TH + 2 * r, TW + 2 * r, D), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return mind, var
