"""Pallas TPU kernels fusing the trilinear-weight arithmetic around the
corner-stack gather (the Adam instance-optimisation hot loop).

The stacked sampler (core/warp.py) splits each iteration into
``gather → weights+reduce`` (forward) and ``corner-reductions → coordinate
gradients`` (backward).  The gather itself is per-index bound (~80 M idx/s,
a hardware floor), but the surrounding elementwise stages are bandwidth
bound and, as separate XLA kernels, re-stream the (8C, N) gathered block and
eight (N,) weight arrays several times (~3.7 ms/iter at 96^3x12 on a ¼-v5e
vs ~1 ms of unavoidable traffic).  These kernels make each side ONE pass
over the block:

* forward: ``out[c, n] = Σ_k block[kC+c, n] · w_k(fracs, bases)[n]`` — the
  eight trilinear weights (with zeros-padding validity masks) are computed
  in VMEM from the fractional coordinates, never materialised in HBM.
* backward: ``cv[k, n] = Σ_c ct[c, n]·block[kC+c, n]`` reduced straight into
  the three coordinate-gradient rows (the ``dxs/dys/dzs`` accumulation of
  core/warp.py:_gs_stacked_bwd) in the same pass.
* fused loss+grad (``corner_reduce_loss_grad``): the Adam data term's VJP
  w.r.t. the sample grid is *linear in the scalar loss cotangent*, so the
  loss partials AND the pre-scaled coordinate-gradient rows come out of ONE
  kernel at forward time — the block is read from HBM once per iteration
  instead of twice, and the (C, N) residual array never round-trips HBM.

Reference hot loop: src/convexAdam/convex_adam_MIND.py:147-191.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_sequential_vmap(fn):
    """Wrap an array-only function so ``vmap`` maps it SEQUENTIALLY.

    Two reasons the default rules are wrong for these kernels:
    * the default ``pallas_call`` batching rule prepends the batch to the
      grid, silently re-keying ``pl.program_id(0)`` — kernels that write
      per-program SMEM slots (the ssq partials) would corrupt their output;
    * a leading batch dimension turns the corner-stack ``take`` into
      XLA:TPU's pathological multi-dimensional gather (measured 9.4 s vs
      1.06 s for the full pipeline at batch size 1).

    Unbatched arguments are closed over (not broadcast) so a shared corner
    stack or fixed-feature block is not copied per batch element.
    """

    @jax.custom_batching.custom_vmap
    def wrapped(*arrays):
        return fn(*arrays)

    @wrapped.def_vmap
    def _rule(axis_size, in_batched, *arrays):
        idx = [i for i, b in enumerate(in_batched) if b]
        if not idx:
            # all-closed-over vmap: no argument carries the batch axis —
            # run once and broadcast (mirrors mind_pallas's in_batched[0]
            # branch; lax.map over an empty tuple would error instead)
            out = wrapped(*arrays)
            out = jax.tree.map(
                lambda o: jnp.broadcast_to(o, (axis_size,) + o.shape), out
            )
            return out, jax.tree.map(lambda _: True, out)

        def call_one(bt):
            full = list(arrays)
            for j, i in enumerate(idx):
                full[i] = bt[j]
            return wrapped(*full)

        out = jax.lax.map(call_one, tuple(arrays[i] for i in idx))
        return out, jax.tree.map(lambda _: True, out)

    return wrapped


_BATCHABLE_CACHE: dict = {}


def corner_reduce_loss_grad_batchable(
    block, pos_rows, fix_flat, chain, vol_shape, interpret: bool = False
):
    key = ("loss_grad", vol_shape, interpret)
    if key not in _BATCHABLE_CACHE:
        _BATCHABLE_CACHE[key] = make_sequential_vmap(
            lambda b, p, f, c: corner_reduce_loss_grad(
                b, p, f, c, vol_shape, interpret
            )
        )
    return _BATCHABLE_CACHE[key](block, pos_rows, fix_flat, chain)


def corner_reduce_fwd_batchable(
    block, fracs, bases, vol_shape, interpret: bool = False
):
    key = ("fwd", vol_shape, interpret)
    if key not in _BATCHABLE_CACHE:
        _BATCHABLE_CACHE[key] = make_sequential_vmap(
            lambda b, f0, f1, f2, b0, b1, b2: corner_reduce_fwd(
                b, (f0, f1, f2), (b0, b1, b2), vol_shape, interpret
            )
        )
    return _BATCHABLE_CACHE[key](block, *fracs, *bases)


def corner_reduce_bwd_batchable(
    block, ct, fracs, bases, vol_shape, scale, interpret: bool = False
):
    key = ("bwd", vol_shape, interpret)
    if key not in _BATCHABLE_CACHE:
        _BATCHABLE_CACHE[key] = make_sequential_vmap(
            lambda b, c, f0, f1, f2, b0, b1, b2, s: corner_reduce_bwd(
                b, c, (f0, f1, f2), (b0, b1, b2), vol_shape, s, interpret
            )
        )
    return _BATCHABLE_CACHE[key](
        block, ct, *fracs, *bases, jnp.asarray(scale, jnp.float32)
    )


def _pick_tn(n: int):
    """Largest lane-tile dividing ``n`` (grids with ragged tails fall back
    to the XLA path rather than paying a pad/copy of the gathered block)."""
    for tn in (8192, 4096, 2048, 1024, 512, 256):
        if n % tn == 0:
            return tn
    return None


def corner_reduce_supported(n: int) -> bool:
    return _pick_tn(n) is not None


def _fwd_kernel(block_ref, fr_ref, base_ref, out_ref, *, C, H, W, D):
    fx, fy, fz = fr_ref[0:1, :], fr_ref[1:2, :], fr_ref[2:3, :]
    x0, y0, z0 = base_ref[0:1, :], base_ref[1:2, :], base_ref[2:3, :]
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    vx = ((x0 >= 0) & (x0 < H), (x0 + 1 >= 0) & (x0 + 1 < H))
    vy = ((y0 >= 0) & (y0 < W), (y0 + 1 >= 0) & (y0 + 1 < W))
    vz = ((z0 >= 0) & (z0 < D), (z0 + 1 >= 0) & (z0 + 1 < D))
    acc = None
    k = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                m = (vx[dx] & vy[dy] & vz[dz]).astype(jnp.float32)
                w = wx[dx] * wy[dy] * wz[dz] * m  # (1, TN)
                blk = block_ref[k * C:(k + 1) * C, :].astype(jnp.float32)
                term = blk * w
                acc = term if acc is None else acc + term
                k += 1
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("vol_shape", "interpret"))
def corner_reduce_fwd(
    block: jax.Array,
    fracs: tuple,
    bases: tuple,
    vol_shape: tuple,
    interpret: bool = False,
) -> jax.Array:
    """``Σ_k block[kC:(k+1)C] * w_k`` with the 8 trilinear zero-padded
    weights computed in-kernel.  ``block``: (8C, N); returns (C, N) f32."""
    C8, n = block.shape
    C = C8 // 8
    _, H, W, D = vol_shape
    TN = _pick_tn(n)
    fr = jnp.stack([f.astype(jnp.float32) for f in fracs])  # (3, N)
    base = jnp.stack([b.astype(jnp.int32) for b in bases])  # (3, N)
    kernel = functools.partial(_fwd_kernel, C=C, H=H, W=W, D=D)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, n), jnp.float32),
        grid=(n // TN,),
        in_specs=[
            pl.BlockSpec((C8, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, TN), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(block, fr, base)


def _fused_loss_kernel(
    block_ref, pos_ref, fix_ref, chain_ref, ssq_ref, dg_ref,
    *, C, H, W, D
):
    """SSD data term AND its coordinate gradient in ONE read of ``block``.

    Pass 1 (corners 0..7): residual ``res = Σ_k w_k·block_k − fix`` and this
    tile's ``Σ res²`` partial.  Pass 2 (same VMEM-resident corners): the
    dxs/dys/dzs coordinate-gradient rows with the MSE chain factor
    ``chain = 2·cost_scale/(C·N)`` already folded in.  The backward pass of
    the sampler is linear in the loss cotangent, so the VJP only has to
    scale these rows — the separate backward kernel (and its second 170 MB
    HBM read of the gathered block at 96³×12) disappears from the Adam loop.

    Takes the absolute voxel positions (3, N) and derives floor/fraction/
    validity in VMEM — materialising separate fraction + base arrays in HBM
    cost ~21 MB/iter of extra traffic at 96³.
    """
    px, py, pz = pos_ref[0:1, :], pos_ref[1:2, :], pos_ref[2:3, :]
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    z0f = jnp.floor(pz)
    fx, fy, fz = px - x0f, py - y0f, pz - z0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    z0 = z0f.astype(jnp.int32)
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    vx = ((x0 >= 0) & (x0 < H), (x0 + 1 >= 0) & (x0 + 1 < H))
    vy = ((y0 >= 0) & (y0 < W), (y0 + 1 >= 0) & (y0 + 1 < W))
    vz = ((z0 >= 0) & (z0 < D), (z0 + 1 >= 0) & (z0 + 1 < D))
    acc = None
    k = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                m = (vx[dx] & vy[dy] & vz[dz]).astype(jnp.float32)
                w = wx[dx] * wy[dy] * wz[dz] * m
                blk = block_ref[k * C:(k + 1) * C, :].astype(jnp.float32)
                term = blk * w
                acc = term if acc is None else acc + term
                k += 1
    res = acc - fix_ref[:].astype(jnp.float32)
    # ssq_ref is the full (n_tiles, 1) SMEM array; each program writes its
    # own slot (Mosaic only allows SMEM blocks covering the whole array)
    ssq_ref[pl.program_id(0), 0] = jnp.sum(res * res)
    ct = res * chain_ref[0, 0]  # (C, TN)
    dxs = dys = dzs = None
    k = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                m = (vx[dx] & vy[dy] & vz[dz]).astype(jnp.float32)
                blk = block_ref[k * C:(k + 1) * C, :].astype(jnp.float32)
                cv = jnp.sum(ct * blk, axis=0, keepdims=True)  # (1, TN)
                sx = 1.0 if dx else -1.0
                sy = 1.0 if dy else -1.0
                sz = 1.0 if dz else -1.0
                tx = cv * (sx * wy[dy] * wz[dz] * m)
                ty = cv * (wx[dx] * sy * wz[dz] * m)
                tz = cv * (wx[dx] * wy[dy] * sz * m)
                if k == 0:
                    dxs, dys, dzs = tx, ty, tz
                else:
                    dxs, dys, dzs = dxs + tx, dys + ty, dzs + tz
                k += 1
    dg_ref[0:1, :] = dxs
    dg_ref[1:2, :] = dys
    dg_ref[2:3, :] = dzs


@functools.partial(jax.jit, static_argnames=("vol_shape", "interpret"))
def corner_reduce_loss_grad(
    block: jax.Array,
    pos_rows: jax.Array,
    fix_flat: jax.Array,
    chain: jax.Array,
    vol_shape: tuple,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused data term: returns (per-tile ssq partials (n_tiles, 1) f32,
    coordinate-gradient rows dg3 (3, N) f32 pre-scaled by ``chain``).

    ``pos_rows`` are the absolute (unnormalized) voxel sample positions as
    (3, N) f32 rows; floor/fraction/bounds-masks are derived in-kernel.
    """
    C8, n = block.shape
    C = C8 // 8
    _, H, W, D = vol_shape
    TN = _pick_tn(n)
    chain_arr = jnp.asarray(chain, jnp.float32).reshape(1, 1)
    kernel = functools.partial(_fused_loss_kernel, C=C, H=H, W=W, D=D)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n // TN, 1), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
        ),
        grid=(n // TN,),
        in_specs=[
            pl.BlockSpec((C8, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (n // TN, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((3, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(block, pos_rows.astype(jnp.float32), fix_flat, chain_arr)


def _bwd_kernel(
    block_ref, ct_ref, scale_ref, fr_ref, base_ref, dg_ref, *, C, H, W, D
):
    fx, fy, fz = fr_ref[0:1, :], fr_ref[1:2, :], fr_ref[2:3, :]
    x0, y0, z0 = base_ref[0:1, :], base_ref[1:2, :], base_ref[2:3, :]
    wx = (1.0 - fx, fx)
    wy = (1.0 - fy, fy)
    wz = (1.0 - fz, fz)
    vx = ((x0 >= 0) & (x0 < H), (x0 + 1 >= 0) & (x0 + 1 < H))
    vy = ((y0 >= 0) & (y0 < W), (y0 + 1 >= 0) & (y0 + 1 < W))
    vz = ((z0 >= 0) & (z0 < D), (z0 + 1 >= 0) & (z0 + 1 < D))
    ct = ct_ref[:].astype(jnp.float32) * scale_ref[0, 0]  # (C, TN)
    dxs = dys = dzs = None
    k = 0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                m = (vx[dx] & vy[dy] & vz[dz]).astype(jnp.float32)
                blk = block_ref[k * C:(k + 1) * C, :].astype(jnp.float32)
                cv = jnp.sum(ct * blk, axis=0, keepdims=True)  # (1, TN)
                sx = 1.0 if dx else -1.0
                sy = 1.0 if dy else -1.0
                sz = 1.0 if dz else -1.0
                tx = cv * (sx * wy[dy] * wz[dz] * m)
                ty = cv * (wx[dx] * sy * wz[dz] * m)
                tz = cv * (wx[dx] * wy[dy] * sz * m)
                if k == 0:
                    dxs, dys, dzs = tx, ty, tz
                else:
                    dxs, dys, dzs = dxs + tx, dys + ty, dzs + tz
                k += 1
    dg_ref[0:1, :] = dxs
    dg_ref[1:2, :] = dys
    dg_ref[2:3, :] = dzs


@functools.partial(jax.jit, static_argnames=("vol_shape", "interpret"))
def corner_reduce_bwd(
    block: jax.Array,
    ct: jax.Array,
    fracs: tuple,
    bases: tuple,
    vol_shape: tuple,
    scale: "jax.Array | float" = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Coordinate-gradient rows (3, N) f32 = the dxs/dys/dzs accumulation of
    the stacked sampler's VJP, one pass over ``block`` (8C, N) and ``ct``
    (C, N); ``ct`` is multiplied by the scalar ``scale`` in-kernel (the
    fused-loss path passes the residual here with the MSE chain factor)."""
    C8, n = block.shape
    C = C8 // 8
    _, H, W, D = vol_shape
    TN = _pick_tn(n)
    fr = jnp.stack([f.astype(jnp.float32) for f in fracs])
    base = jnp.stack([b.astype(jnp.int32) for b in bases])
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    kernel = functools.partial(_bwd_kernel, C=C, H=H, W=W, D=D)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        grid=(n // TN,),
        in_specs=[
            pl.BlockSpec((C8, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, TN), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(block, ct, scale_arr, fr, base)
