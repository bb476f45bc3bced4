"""Trilinear warping / resampling primitives with exact PyTorch semantics.

The reference pipelines are built on ``F.grid_sample`` / ``F.affine_grid`` /
``F.interpolate`` and mix ``align_corners=True/False`` conventions (e.g.
reference src/convexAdam/convex_adam_MIND.py:127,139-141,160-174 and
src/convexAdam/convex_adam_utils.py:114-135).  Everything downstream
(inverse consistency, the Adam instance optimisation, field upsampling)
depends on those exact conventions, so this module re-derives them from
first principles for JAX.

Design decisions (TPU-first):

* coordinates are kept in **array order** — channel ``0`` indexes array axis
  ``0`` (H), channel ``2`` indexes the innermost axis (D).  The reference's
  ``.flip(1)`` dances exist only because torch's ``grid_sample`` wants
  ``(x, y, z)`` = (innermost, ..., outermost); we avoid them entirely.
* every function is pure, shape-static and differentiable — safe under
  ``jit`` / ``vmap`` / ``grad`` / ``shard_map``.
* gathers are performed on flattened spatial dims with one linear index per
  trilinear corner so XLA emits a single efficient gather per corner.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# normalized-coordinate helpers (torch grid conventions)
# ---------------------------------------------------------------------------

def unnormalize_coord(g: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map a normalized coordinate in [-1, 1] to a voxel coordinate.

    Matches torch ``grid_sampler_unnormalize``:
    ``align_corners=True``:  ``(g + 1) / 2 * (size - 1)``
    ``align_corners=False``: ``((g + 1) * size - 1) / 2``
    """
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def normalize_coord(x: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Inverse of :func:`unnormalize_coord`."""
    if align_corners:
        return x * (2.0 / (size - 1)) - 1.0
    return (2.0 * x + 1.0) / size - 1.0


def identity_grid_normalized(
    shape: Sequence[int], align_corners: bool, dtype=jnp.float32
) -> jax.Array:
    """Identity sampling grid in normalized coords, array order, shape (H,W,D,3).

    Equivalent to ``F.affine_grid(eye(3,4), (1,1,H,W,D), align_corners=ac)``
    (reference convex_adam_utils.py:121, convex_adam_MIND.py:160) except the
    last dim is (axis0, axis1, axis2) instead of torch's (x, y, z) reversal.
    """
    H, W, D = shape
    axes = []
    for n in (H, W, D):
        i = jnp.arange(n, dtype=dtype)
        axes.append(normalize_coord(i, n, align_corners))
    gh, gw, gd = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gh, gw, gd], axis=-1)


def identity_grid_voxels(shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    """Identity grid in voxel units, shape (3, H, W, D)."""
    H, W, D = shape
    gh, gw, gd = jnp.meshgrid(
        jnp.arange(H, dtype=dtype),
        jnp.arange(W, dtype=dtype),
        jnp.arange(D, dtype=dtype),
        indexing="ij",
    )
    return jnp.stack([gh, gw, gd], axis=0)


# ---------------------------------------------------------------------------
# grid_sample (trilinear)
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def _take_columns_fenced(mat, idx):
    """``mat[:, idx]`` on the fast 1-D gather path, with the optimization
    barriers that keep elementwise consumers OUT of the gather kernel.

    custom_vmap: a leading batch dimension turns XLA:TPU's take into a
    pathological multi-dimensional gather (measured 9.4 s vs 1.06 s for the
    full registration at batch size 1), so batched operands are mapped
    sequentially — per-index cost is a hardware floor anyway, sequential
    loses nothing.
    """
    out = jnp.take(mat, lax.optimization_barrier(idx), axis=1)
    return lax.optimization_barrier(out)


@_take_columns_fenced.def_vmap
def _take_columns_fenced_vmap(axis_size, in_batched, mat, idx):
    del axis_size
    mat_b, idx_b = in_batched
    if mat_b and idx_b:
        out = jax.lax.map(
            lambda t: _take_columns_fenced(t[0], t[1]), (mat, idx)
        )
    elif idx_b:
        out = jax.lax.map(lambda i: _take_columns_fenced(mat, i), idx)
    else:
        out = jax.lax.map(lambda m: _take_columns_fenced(m, idx), mat)
    return out, True


def _gather_corners(vol_flat, idx_h, idx_w, idx_d, W, D):
    """Gather vol_flat (C, H*W*D) at integer corner coords (N,) → (C, N)."""
    lin = (idx_h * W + idx_w) * D + idx_d
    return _take_columns_fenced(vol_flat, lin)


def _gs_coords(vol_shape, g, align_corners, padding_mode):
    """Shared coordinate computation for the bilinear sampler fwd/bwd."""
    C, H, W, D = vol_shape
    x = unnormalize_coord(g[:, 0], H, align_corners)
    y = unnormalize_coord(g[:, 1], W, align_corners)
    z = unnormalize_coord(g[:, 2], D, align_corners)
    if padding_mode == "border":
        # gradient of the clip is handled in bwd via in-range masks
        xc = jnp.clip(x, 0.0, H - 1)
        yc = jnp.clip(y, 0.0, W - 1)
        zc = jnp.clip(z, 0.0, D - 1)
    else:
        xc, yc, zc = x, y, z
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    z0 = jnp.floor(zc)
    return (
        (x, y, z),
        (xc - x0, yc - y0, zc - z0),
        (x0.astype(jnp.int32), y0.astype(jnp.int32), z0.astype(jnp.int32)),
    )


def _corner_terms(vol_shape, fracs, bases, padding_mode, compute_dtype):
    """Iterate the 8 trilinear corners → (weight-per-axis triplet, mask,
    clipped linear index)."""
    C, H, W, D = vol_shape
    fx, fy, fz = fracs
    x0i, y0i, z0i = bases
    for dx in (0, 1):
        wx = fx if dx else (1.0 - fx)
        xi = x0i + dx
        vx = (xi >= 0) & (xi < H)
        xi_c = jnp.clip(xi, 0, H - 1)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            yi = y0i + dy
            vy = (yi >= 0) & (yi < W)
            yi_c = jnp.clip(yi, 0, W - 1)
            for dz in (0, 1):
                wz = fz if dz else (1.0 - fz)
                zi = z0i + dz
                vz = (zi >= 0) & (zi < D)
                zi_c = jnp.clip(zi, 0, D - 1)
                if padding_mode == "zeros":
                    m = (vx & vy & vz).astype(compute_dtype)
                else:
                    m = jnp.ones_like(wx)
                lin = (xi_c * W + yi_c) * D + zi_c
                yield (dx, dy, dz), (wx, wy, wz), m, lin


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_bilinear(vol, g, align_corners, padding_mode):
    """Trilinear sampling core: vol (C,H,W,D), g (N,3) normalized → (C,N).

    Custom VJP: JAX's autodiff of the gather-based forward re-fuses the
    per-channel gathers into a multi-row gather that hits XLA:TPU's slow
    path (~600 ms/backward at 96^3x12 on v5e vs <1 ms hand-written), so both
    directions are written with fast 1-D per-channel gathers; the cotangent
    w.r.t. ``vol`` (scatter-add) is emitted too but DCE'd by XLA whenever the
    caller doesn't need it (e.g. the Adam instance loop differentiates only
    w.r.t. the displacement grid, convex_adam_MIND.py:155-179).
    """
    C, H, W, D = vol.shape
    compute_dtype = jnp.promote_types(vol.dtype, g.dtype)
    g = g.astype(compute_dtype)
    vol_flat = vol.reshape(C, -1).astype(compute_dtype)
    _, fracs, bases = _gs_coords(vol.shape, g, align_corners, padding_mode)
    acc = jnp.zeros((C, g.shape[0]), dtype=compute_dtype)
    for _, (wx, wy, wz), m, lin in _corner_terms(
        vol.shape, fracs, bases, padding_mode, compute_dtype
    ):
        w = wx * wy * wz * m
        corner = _take_columns_fenced(vol_flat, lin)
        acc = acc + corner * w[None, :]
    return acc


def _grid_sample_bilinear_fwd(vol, g, align_corners, padding_mode):
    return _grid_sample_bilinear(vol, g, align_corners, padding_mode), (vol, g)


def _grid_sample_bilinear_bwd(align_corners, padding_mode, res, ct):
    vol, g = res
    C, H, W, D = vol.shape
    compute_dtype = jnp.promote_types(vol.dtype, g.dtype)
    gc = g.astype(compute_dtype)
    vol_flat = vol.reshape(C, -1).astype(compute_dtype)
    ct = ct.astype(compute_dtype)
    coords, fracs, bases = _gs_coords(vol.shape, gc, align_corners, padding_mode)

    n = gc.shape[0]
    dxs = jnp.zeros((n,), compute_dtype)
    dys = jnp.zeros((n,), compute_dtype)
    dzs = jnp.zeros((n,), compute_dtype)
    dvol_flat = jnp.zeros_like(vol_flat)
    for (dx, dy, dz), (wx, wy, wz), m, lin in _corner_terms(
        vol.shape, fracs, bases, padding_mode, compute_dtype
    ):
        corner = _take_columns_fenced(vol_flat, lin)  # (C, N)
        ct_dot_v = jnp.sum(ct * corner, axis=0)  # (N,)
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        sz = 1.0 if dz else -1.0
        dxs = dxs + ct_dot_v * (sx * wy * wz * m)
        dys = dys + ct_dot_v * (wx * sy * wz * m)
        dzs = dzs + ct_dot_v * (wx * wy * sz * m)
        w = wx * wy * wz * m
        dvol_flat = dvol_flat.at[:, lin].add(ct * w[None, :])

    # chain through the unnormalization (and border clip gradient)
    x, y, z = coords
    if align_corners:
        scale = ((H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0)
    else:
        scale = (H / 2.0, W / 2.0, D / 2.0)
    if padding_mode == "border":
        dxs = dxs * ((x > 0) & (x < H - 1)).astype(compute_dtype)
        dys = dys * ((y > 0) & (y < W - 1)).astype(compute_dtype)
        dzs = dzs * ((z > 0) & (z < D - 1)).astype(compute_dtype)
    dg = jnp.stack([dxs * scale[0], dys * scale[1], dzs * scale[2]], axis=1)
    return dvol_flat.reshape(vol.shape).astype(vol.dtype), dg.astype(g.dtype)


_grid_sample_bilinear.defvjp(_grid_sample_bilinear_fwd, _grid_sample_bilinear_bwd)


def grid_sample_3d(
    vol: jax.Array,
    grid: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    mode: str = "bilinear",
) -> jax.Array:
    """Sample ``vol`` (C, H, W, D) at normalized coords ``grid`` (..., 3).

    Semantics match ``F.grid_sample(vol[None], grid_torch[None], mode,
    padding_mode, align_corners)`` where ``grid_torch`` is ``grid`` with the
    last axis reversed (torch wants x=innermost first; we take array order).
    Reference call sites: convex_adam_utils.py:126-127 (zeros, ac=False),
    convex_adam_MIND.py:174 (zeros, ac=False, bilinear).

    Differentiable in both ``vol`` and ``grid`` (custom VJP tuned for TPU).
    """
    C, H, W, D = vol.shape
    out_shape = grid.shape[:-1]
    g = grid.reshape(-1, 3)
    compute_dtype = jnp.promote_types(vol.dtype, g.dtype)

    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    if mode == "nearest":
        g = g.astype(compute_dtype)
        x = unnormalize_coord(g[:, 0], H, align_corners)
        y = unnormalize_coord(g[:, 1], W, align_corners)
        z = unnormalize_coord(g[:, 2], D, align_corners)
        if padding_mode == "border":
            x = jnp.clip(x, 0.0, H - 1)
            y = jnp.clip(y, 0.0, W - 1)
            z = jnp.clip(z, 0.0, D - 1)
        vol_flat = vol.reshape(C, -1).astype(compute_dtype)
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        zi = jnp.round(z).astype(jnp.int32)
        inb = (
            (xi >= 0) & (xi < H) & (yi >= 0) & (yi < W) & (zi >= 0) & (zi < D)
        )
        xi = jnp.clip(xi, 0, H - 1)
        yi = jnp.clip(yi, 0, W - 1)
        zi = jnp.clip(zi, 0, D - 1)
        out = _gather_corners(vol_flat, xi, yi, zi, W, D)
        if padding_mode == "zeros":
            out = jnp.where(inb[None, :], out, 0.0)
        return out.reshape((C,) + out_shape)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    out = _grid_sample_bilinear(vol, g, align_corners, padding_mode)
    return out.reshape((C,) + out_shape)


# ---------------------------------------------------------------------------
# corner-stacked sampler — the fast path for iterative warping (Adam loop)
# ---------------------------------------------------------------------------
#
# XLA:TPU gathers are per-take bound: a take fetching (12, N) columns costs
# ~20 ms at N≈0.9M on v5e while a take fetching (96, N) columns costs ~11 ms
# (a vectorized lowering kicks in for tall columns).  Trilinear sampling
# needs the 2x2x2 neighbourhood of every sample point, i.e. 8 takes of
# (C, N) — but if the volume is pre-stacked with its 8 corner-shifted copies,
# ONE take of (8C, N) fetches the whole neighbourhood: ~4x faster per
# iteration, and the stack is built once per optimisation (loop-invariant).

def build_corner_stack(vol: jax.Array) -> jax.Array:
    """Stack the 8 corner-shifted copies of ``vol`` (C, H, W, D) over a
    1-voxel zero-padded base grid → (8, C, H+1, W+1, D+1).

    Entry ``[k, c, b]`` with corner ``k = (dx, dy, dz)`` and base ``b`` in
    the extended grid (base index = floor coordinate + 1, valid for floor
    coordinates down to -1) equals ``vol[c, b - 1 + (dx, dy, dz)]`` with
    zeros outside.
    """
    C, H, W, D = vol.shape
    volp = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1)))
    stacks = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                stacks.append(
                    volp[:, dx : dx + H + 1, dy : dy + W + 1, dz : dz + D + 1]
                )
    return jnp.stack(stacks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_stacked(vol8, g, align_corners, vol_shape):
    out, _ = _gs_stacked_fwd_impl(vol8, g, align_corners, vol_shape)
    return out


def _gs_stacked_common(vol8, g, align_corners, vol_shape):
    C, H, W, D = vol_shape
    compute_dtype = jnp.promote_types(vol8.dtype, g.dtype)
    gc = g.astype(compute_dtype)
    _, fracs, bases = _gs_coords((C, H, W, D), gc, align_corners, "zeros")
    fx, fy, fz = fracs
    x0i, y0i, z0i = bases
    # base index into the extended (H+1, W+1, D+1) grid; valid floor range
    # is [-1, H-1] — clamp (values outside get zero weight via the masks)
    xb = jnp.clip(x0i + 1, 0, H)
    yb = jnp.clip(y0i + 1, 0, W)
    zb = jnp.clip(z0i + 1, 0, D)
    lin = (xb * (W + 1) + yb) * (D + 1) + zb
    n = gc.shape[0]
    # gather in the stack's own dtype (bf16 stacks halve consumer traffic;
    # the upcast fuses into the consumers) and fence it: XLA fuses
    # elementwise consumers INTO the gather kernel, which runs ~7x below
    # streaming bandwidth on TPU — barriers keep producer/consumer kernels
    # at full VPU speed (measured 46→32 ms/iter on the Adam loop, 96^3x12)
    # block stays in the stack's dtype; upcasts fuse into consumers
    vol8_flat = vol8.reshape(8 * C, -1)
    block = _take_columns_fenced(vol8_flat, lin).reshape(8, C, n)
    # per-corner weights with zeros-padding masks
    ws = []
    masks = []
    axis_w = []
    k = 0
    for dx in (0, 1):
        wx = fx if dx else (1.0 - fx)
        vx = (x0i + dx >= 0) & (x0i + dx < H)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            vy = (y0i + dy >= 0) & (y0i + dy < W)
            for dz in (0, 1):
                wz = fz if dz else (1.0 - fz)
                vz = (z0i + dz >= 0) & (z0i + dz < D)
                m = (vx & vy & vz).astype(compute_dtype)
                ws.append(wx * wy * wz * m)
                masks.append(m)
                axis_w.append((dx, dy, dz, wx, wy, wz))
                k += 1
    return compute_dtype, fracs, bases, lin, block, ws, masks, axis_w


def _stacked_weighted_reduce(block, fracs, bases, ws, vol_shape):
    """``out[c] = Σ_k block[k, c] · w_k`` — via the fused Pallas kernel on
    TPU (one pass over the gathered block, weights computed in VMEM; see
    ops/warp_pallas.py) or the XLA stack-multiply elsewhere."""
    C, H, W, D = vol_shape
    n = block.shape[-1]
    if jax.default_backend() == "tpu":
        from convexadam_tpu.ops.warp_pallas import (  # noqa: PLC0415
            corner_reduce_fwd_batchable,
            corner_reduce_supported,
        )

        if corner_reduce_supported(n):
            return corner_reduce_fwd_batchable(
                block.reshape(8 * C, n), fracs, bases, vol_shape
            )
    w8 = jnp.stack(ws)  # (8, N)
    return jnp.sum(block * w8[:, None, :], axis=0)  # (C, N)


def _gs_stacked_fwd_impl(vol8, g, align_corners, vol_shape):
    (compute_dtype, fracs, bases, _, block, ws, _, _) = _gs_stacked_common(
        vol8, g, align_corners, vol_shape
    )
    out = _stacked_weighted_reduce(block, fracs, bases, ws, vol_shape)
    return out, None


def _gs_stacked_fwd(vol8, g, align_corners, vol_shape):
    (compute_dtype, fracs, bases, _, block, ws, _, _) = _gs_stacked_common(
        vol8, g, align_corners, vol_shape
    )
    out = _stacked_weighted_reduce(block, fracs, bases, ws, vol_shape)
    # save the gathered block: the backward then needs NO gather at all
    # (the zero-size token only carries vol8's dtype for the cotangent)
    return out, (block, g, jnp.zeros((0,), vol8.dtype))


def _gs_stacked_bwd(align_corners, vol_shape, res, ct):
    block, g, vol8_dtype_token = res
    vol8_dtype = vol8_dtype_token.dtype
    C, H, W, D = vol_shape
    compute_dtype = block.dtype
    gc = g.astype(compute_dtype)
    _, fracs, bases = _gs_coords((C, H, W, D), gc, align_corners, "zeros")
    fx, fy, fz = fracs
    x0i, y0i, z0i = bases
    xb = jnp.clip(x0i + 1, 0, H)
    yb = jnp.clip(y0i + 1, 0, W)
    zb = jnp.clip(z0i + 1, 0, D)
    lin = (xb * (W + 1) + yb) * (D + 1) + zb
    ws = []
    masks = []
    axis_w = []
    for dx in (0, 1):
        wx = fx if dx else (1.0 - fx)
        vx = (x0i + dx >= 0) & (x0i + dx < H)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            vy = (y0i + dy >= 0) & (y0i + dy < W)
            for dz in (0, 1):
                wz = fz if dz else (1.0 - fz)
                vz = (z0i + dz >= 0) & (z0i + dz < D)
                m = (vx & vy & vz).astype(compute_dtype)
                ws.append(wx * wy * wz * m)
                masks.append(m)
                axis_w.append((dx, dy, dz, wx, wy, wz))
    ct = ct.astype(compute_dtype)
    n = g.shape[0]
    use_pallas = False
    if jax.default_backend() == "tpu":
        from convexadam_tpu.ops.warp_pallas import (  # noqa: PLC0415
            corner_reduce_bwd_batchable,
            corner_reduce_supported,
        )

        use_pallas = corner_reduce_supported(n)
    if use_pallas:
        # fused single pass over block: corner reductions + dxs/dys/dzs
        dg3 = corner_reduce_bwd_batchable(
            block.reshape(8 * C, n), ct.astype(jnp.float32),
            (fx, fy, fz), (x0i, y0i, z0i), (C, H, W, D), 1.0,
        )
        dxs, dys, dzs = dg3[0], dg3[1], dg3[2]
    else:
        # all 8 corner reductions in one pass: cv[k, n] = Σ_c ct·block
        cv = jnp.einsum(
            "cn,kcn->kn", ct, block.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        dxs = jnp.zeros((n,), compute_dtype)
        dys = jnp.zeros((n,), compute_dtype)
        dzs = jnp.zeros((n,), compute_dtype)
        for k, (dx, dy, dz, wx, wy, wz) in enumerate(axis_w):
            m = masks[k]
            ct_dot_v = cv[k]
            sx = 1.0 if dx else -1.0
            sy = 1.0 if dy else -1.0
            sz = 1.0 if dz else -1.0
            dxs = dxs + ct_dot_v * (sx * wy * wz * m)
            dys = dys + ct_dot_v * (wx * sy * wz * m)
            dzs = dzs + ct_dot_v * (wx * wy * sz * m)
    # cotangent for the stacked volume (lazy — DCE'd when unused, which is
    # always the case in the Adam loop where vol8 is a constant)
    ctw8 = [ct * ws[k][None, :] for k in range(8)]
    # cotangent for the stacked volume (scatter — DCE'd when unused)
    dvol8_flat = jnp.zeros((8 * C, (H + 1) * (W + 1) * (D + 1)), compute_dtype)
    dvol8_flat = dvol8_flat.at[:, lin].add(
        jnp.concatenate(ctw8, axis=0)
    )
    if align_corners:
        scale = ((H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0)
    else:
        scale = (H / 2.0, W / 2.0, D / 2.0)
    dg = jnp.stack([dxs * scale[0], dys * scale[1], dzs * scale[2]], axis=1)
    return (
        dvol8_flat.reshape((8, C, H + 1, W + 1, D + 1)).astype(vol8_dtype),
        dg.astype(g.dtype),
    )


_grid_sample_stacked.defvjp(_gs_stacked_fwd, _gs_stacked_bwd)


def warp_with_displacement_stacked(
    vol8: jax.Array,
    vol_shape: tuple[int, int, int, int],
    disp_voxels: jax.Array,
    align_corners: bool = False,
) -> jax.Array:
    """Like :func:`warp_with_displacement` (zeros padding, bilinear) but
    sampling from a prebuilt corner stack — numerically identical, ~4x faster
    per evaluation inside iterative loops on TPU."""
    C, H, W, D = vol_shape
    scale = jnp.array(
        [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], dtype=disp_voxels.dtype
    ).reshape(3, 1, 1, 1)
    grid = identity_grid_normalized((H, W, D), align_corners, disp_voxels.dtype)
    grid = grid + jnp.moveaxis(disp_voxels / scale, 0, -1)
    g = grid.reshape(-1, 3)
    out = _grid_sample_stacked(vol8, g, align_corners, vol_shape)
    return out.reshape((C, H, W, D))


# ---------------------------------------------------------------------------
# fused data-term loss (Adam loop): warp + SSD + reductions in the kernels
# ---------------------------------------------------------------------------

def _sub_extent(size: int, stride: int) -> int:
    """Points of ``range(0, size, stride)`` — the strided sample lattice."""
    return -(-size // stride)


def _stacked_mse_pos(disp, align_corners, vol_shape, stride: int = 1):
    """Per-axis absolute sample coordinates for the fused data-term path.

    The public sampler convention (torch parity) builds a normalized grid
    ``g = id + disp/((size-1)/2)`` and unnormalizes with the ``size/2``
    (align_corners=False) factors; composing the two gives the absolute
    voxel position ``pos_axis = index_axis + disp_axis * size/(size-1)``
    (exactly 1 for align_corners=True).  Working per-axis in (3, n)-row
    layout keeps the lane dimension wide — the (n, 3) grid array (lane dim
    3, padded to 128 on TPU) forced ~1.4 ms/iter of relayout copies at 96³.

    ``stride`` > 1 evaluates on the strided sample lattice
    ``(::stride, ::stride, ::stride)`` of the full grid (``disp`` then
    carries the sub-lattice's displacement rows); the gather's per-index
    cost — the Adam-loop floor — drops by ``stride³``.

    Returns (pos_rows (3, n) f32, fac).
    """
    _, H, W, D = vol_shape
    d = disp.astype(jnp.float32).reshape(3, -1)
    if align_corners:
        fac = (1.0, 1.0, 1.0)
    else:
        fac = (H / (H - 1.0), W / (W - 1.0), D / (D - 1.0))
    hs, ws, ds_ = (_sub_extent(s, stride) for s in (H, W, D))
    st = jnp.float32(stride)
    ii = jnp.broadcast_to(
        st * jnp.arange(hs, dtype=jnp.float32)[:, None, None], (hs, ws, ds_)
    ).reshape(-1)
    jj = jnp.broadcast_to(
        st * jnp.arange(ws, dtype=jnp.float32)[None, :, None], (hs, ws, ds_)
    ).reshape(-1)
    kk = jnp.broadcast_to(
        st * jnp.arange(ds_, dtype=jnp.float32)[None, None, :], (hs, ws, ds_)
    ).reshape(-1)
    pos = jnp.stack(
        [ii + d[0] * fac[0], jj + d[1] * fac[1], kk + d[2] * fac[2]]
    )
    return pos, fac


def _stacked_mse_coords(pos):
    """floor/fraction/int-base rows from absolute positions (3, n)."""
    p0 = jnp.floor(pos)
    fr = pos - p0
    base = p0.astype(jnp.int32)
    return (
        (fr[0], fr[1], fr[2]),
        (base[0], base[1], base[2]),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _stacked_mse(
    vol8, disp, fix_flat, cost_scale, align_corners, vol_shape, stride=1
):
    loss, _ = _stacked_mse_fwd(
        vol8, disp, fix_flat, cost_scale, align_corners, vol_shape, stride
    )
    return loss


def _fused_loss_grad(
    vol8, disp, fix_flat, cost_scale, align_corners, vol_shape,
    interpret=False, stride=1,
):
    """Shared body of the fused data term: corner-stack gather + one-pass
    loss/coordinate-gradient kernel.  Both the ``custom_vjp`` path
    (:func:`_stacked_mse_fwd`) and the explicitly-composed Adam-loop path
    (:func:`warp_ssd_loss_and_grad`) route through here — the index math
    and chain factors must never diverge between them.

    With ``stride`` > 1 the loss is the mean over the strided sample
    lattice only (``disp``/``fix_flat`` carry sub-lattice values) and
    ``ddisp`` is the gradient w.r.t. the sub-lattice displacement.

    Returns ``(loss, ddisp, block, ssq_total)``.
    """
    from convexadam_tpu.ops.warp_pallas import (  # noqa: PLC0415
        corner_reduce_loss_grad_batchable,
    )

    C, H, W, D = vol_shape
    pos, fac = _stacked_mse_pos(disp, align_corners, vol_shape, stride)
    n = pos.shape[1]
    x0i = jnp.floor(pos).astype(jnp.int32)
    xb = jnp.clip(x0i[0] + 1, 0, H)
    yb = jnp.clip(x0i[1] + 1, 0, W)
    zb = jnp.clip(x0i[2] + 1, 0, D)
    lin = (xb * (W + 1) + yb) * (D + 1) + zb
    vol8_flat = vol8.reshape(8 * C, -1)
    block = _take_columns_fenced(vol8_flat, lin)
    # the VJP w.r.t. the displacement is linear in the (scalar) loss
    # cotangent, so the whole coordinate gradient is computed in the SAME
    # kernel pass that reduces the loss — the backward pass only scales it.
    # One HBM read of the 170 MB gathered block per iteration instead of two.
    chain0 = 2.0 * jnp.asarray(cost_scale, jnp.float32) / (C * n)
    ssq, dg3 = corner_reduce_loss_grad_batchable(
        block, pos, fix_flat, chain0, vol_shape, interpret=interpret
    )
    ssq_total = jnp.sum(ssq)
    loss = ssq_total * (cost_scale / (C * n))
    ddisp = jnp.concatenate(
        [dg3[0:1] * fac[0], dg3[1:2] * fac[1], dg3[2:3] * fac[2]]
    ).reshape(disp.shape)
    return loss, ddisp, block, ssq_total


def _stacked_mse_fwd(
    vol8, disp, fix_flat, cost_scale, align_corners, vol_shape, stride=1
):
    loss, ddisp_pre, block, ssq_total = _fused_loss_grad(
        vol8, disp, fix_flat.astype(jnp.float32), cost_scale,
        align_corners, vol_shape, stride=stride,
    )
    return loss, (
        ddisp_pre, block, disp, fix_flat, cost_scale, ssq_total,
        jnp.zeros((0,), vol8.dtype),
    )


def _stacked_mse_bwd(align_corners, vol_shape, stride, resids, ctl):
    from convexadam_tpu.ops.warp_pallas import (  # noqa: PLC0415
        corner_reduce_fwd_batchable,
    )

    ddisp_pre, block, disp, fix_flat, cost_scale, ssq_total, vol8_token = (
        resids
    )
    C, H, W, D = vol_shape
    n = fix_flat.shape[-1]  # sampled-point count (= H*W*D when stride == 1)
    ddisp = (ctl.astype(jnp.float32) * ddisp_pre).astype(disp.dtype)
    # vol8/fix cotangents are lazy recomputes (DCE'd by jax/XLA in the Adam
    # loop, where both are loop constants and only the grid is differentiated)
    dvol8 = jnp.zeros((8, C, H + 1, W + 1, D + 1), vol8_token.dtype)
    pos, _ = _stacked_mse_pos(disp, align_corners, vol_shape, stride)
    fracs, bases = _stacked_mse_coords(pos)
    warped = corner_reduce_fwd_batchable(block, fracs, bases, (C, H, W, D))
    res = warped - fix_flat.astype(jnp.float32)
    chain = ctl * (2.0 * cost_scale / (C * n))
    dfix = (-chain) * res
    dcost = ctl * ssq_total / (C * n)
    return dvol8, ddisp, dfix, dcost


_stacked_mse.defvjp(_stacked_mse_fwd, _stacked_mse_bwd)


def warp_ssd_mean_loss(
    vol8: jax.Array,
    vol_shape: tuple[int, int, int, int],
    disp_voxels: jax.Array,
    feat_fix: jax.Array,
    cost_scale,
    align_corners: bool = False,
    stride: int = 1,
) -> jax.Array:
    """The Adam data term ``mean(mean_c((warp(mov) − fix)²) · cost_scale)``
    (convex_adam_MIND.py:174-176) on a prebuilt corner stack.

    On TPU the residual and its square-sum come straight out of the fused
    forward kernel and the MSE chain factor folds into the backward kernel
    (ops/warp_pallas.py) — the separate loss/cotangent elementwise passes
    over the (C, N) warped features disappear.  Elsewhere this is the plain
    composition of the stacked sampler with the XLA reductions.

    With ``stride`` > 1 the mean runs over the ``(::stride,)*3`` sample
    sub-lattice only (an opt-in speed knob — the gather's per-index cost is
    the Adam-loop floor); ``disp_voxels`` and ``feat_fix`` then carry the
    sub-lattice values, while ``vol8``/``vol_shape`` stay full-resolution.
    """
    C, H, W, D = vol_shape
    hs, ws, ds_ = (_sub_extent(s, stride) for s in (H, W, D))
    n = hs * ws * ds_
    if jax.default_backend() == "tpu":
        from convexadam_tpu.ops.warp_pallas import (  # noqa: PLC0415
            corner_reduce_supported,
        )

        if corner_reduce_supported(n):
            return _stacked_mse(
                vol8, disp_voxels, feat_fix.reshape(C, -1).astype(jnp.float32),
                cost_scale, align_corners, vol_shape, stride,
            )
    scale = jnp.array(
        [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], dtype=disp_voxels.dtype
    ).reshape(3, 1, 1, 1)
    axes = [
        normalize_coord(
            jnp.arange(0, s, stride, dtype=disp_voxels.dtype), s, align_corners
        )
        for s in (H, W, D)
    ]
    gh, gw, gd = jnp.meshgrid(*axes, indexing="ij")
    grid = jnp.stack([gh, gw, gd], axis=-1)
    grid = grid + jnp.moveaxis(disp_voxels / scale, 0, -1)
    g = grid.reshape(-1, 3)
    warped = _grid_sample_stacked(vol8, g, align_corners, vol_shape).reshape(
        (C, hs, ws, ds_)
    )
    cost = jnp.mean((warped - feat_fix) ** 2, axis=0) * cost_scale
    return jnp.mean(cost)


def warp_ssd_loss_and_grad(
    vol8: jax.Array,
    vol_shape: tuple[int, int, int, int],
    disp_voxels: jax.Array,
    fix_flat: jax.Array,
    cost_scale,
    align_corners: bool = False,
    interpret: bool = False,
    stride: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Adam data term AND its displacement gradient, explicitly composed.

    Returns ``(loss, dloss/ddisp)`` with identical numerics to
    ``jax.grad(warp_ssd_mean_loss)`` on the fused TPU path, but WITHOUT the
    ``custom_vjp`` call boundary: measured on the ¼-v5e at 96³×12, routing
    the same ops through ``custom_vjp`` costs +1.3 ms/iter even for the
    primal alone (the call sub-jaxpr hides the shared coordinate/gather ops
    from DCE/fusion inside the scan body).  The Adam instance loop
    (core/adam.py) uses this together with explicit ``jax.vjp`` of the
    smoother and regularizer instead of differentiating the whole loss.

    Only valid on the fused path — callers must check
    ``corner_reduce_supported(H*W*D)`` and the TPU backend first.
    """
    loss, ddisp, _, _ = _fused_loss_grad(
        vol8, disp_voxels, fix_flat, cost_scale, align_corners, vol_shape,
        interpret=interpret, stride=stride,
    )
    return loss, ddisp


def warp_with_displacement(
    vol: jax.Array,
    disp_voxels: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "zeros",
    mode: str = "bilinear",
) -> jax.Array:
    """Warp ``vol`` (C,H,W,D) by a voxel-unit displacement field (3,H,W,D).

    Builds the sampling grid exactly as the reference Adam stage does
    (convex_adam_MIND.py:171-174): identity grid with ``align_corners=False``
    spacing plus the displacement normalized by ``(n-1)/2`` (an
    align_corners=True normalization), sampled with ``align_corners=False``.
    This deliberate convention mismatch is part of reference behaviour.
    """
    C, H, W, D = vol.shape
    scale = jnp.array(
        [(H - 1) / 2.0, (W - 1) / 2.0, (D - 1) / 2.0], dtype=disp_voxels.dtype
    ).reshape(3, 1, 1, 1)
    grid = identity_grid_normalized((H, W, D), align_corners, disp_voxels.dtype)
    grid = grid + jnp.moveaxis(disp_voxels / scale, 0, -1)
    return grid_sample_3d(
        vol, grid, align_corners=align_corners, padding_mode=padding_mode, mode=mode
    )


# ---------------------------------------------------------------------------
# F.interpolate(trilinear) equivalent — separable per-axis
# ---------------------------------------------------------------------------

def _linear_resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = i * ((in_size - 1) / (out_size - 1))
    else:
        # torch area_pixel_compute_source_index, clamped below at 0
        src = jnp.maximum((i + 0.5) * (in_size / out_size) - 0.5, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0.astype(jnp.float32)).astype(x.dtype)
    lo = jnp.take(x, i0, axis=axis)
    hi = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    return lo * (1 - w1) + hi * w1


def resize_trilinear(
    x: jax.Array, size: Sequence[int], align_corners: bool = False
) -> jax.Array:
    """``F.interpolate(x, size, mode='trilinear', align_corners=ac)`` for
    (..., H, W, D) arrays.  Reference call sites: convex_adam_MIND.py:141,153,182.
    """
    nd = x.ndim
    for k, out_size in enumerate(size):
        x = _linear_resize_axis(x, nd - 3 + k, int(out_size), align_corners)
    return x


# ---------------------------------------------------------------------------
# map_coordinates (scipy order=1 equivalent) — used by apply_convex
# ---------------------------------------------------------------------------

def map_coordinates_trilinear(
    vol: jax.Array, coords: jax.Array, mode: str = "constant"
) -> jax.Array:
    """``scipy.ndimage.map_coordinates(vol, coords, order=1)`` equivalent.

    ``vol`` is (H, W, D); ``coords`` is (3, ...) in voxel units.
    Reference: apply_convex.py:22-23.

    scipy border semantics: with ``mode='constant'`` a sample whose coordinate
    falls outside ``[0, n-1]`` on *any* axis is set wholly to ``cval=0`` (no
    partial blending with interior values); ``mode='nearest'`` clamps.
    """
    H, W, D = vol.shape
    out_shape = coords.shape[1:]
    c = coords.reshape(3, -1)
    if mode == "constant":
        inb = (
            (c[0] >= 0) & (c[0] <= H - 1)
            & (c[1] >= 0) & (c[1] <= W - 1)
            & (c[2] >= 0) & (c[2] <= D - 1)
        )
    elif mode != "nearest":
        raise ValueError(f"unsupported mode: {mode}")
    x = jnp.clip(c[0], 0.0, H - 1)
    y = jnp.clip(c[1], 0.0, W - 1)
    z = jnp.clip(c[2], 0.0, D - 1)
    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    fx = x - x0; fy = y - y0; fz = z - z0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)
    vol_flat = vol.reshape(1, -1)
    acc = jnp.zeros((c.shape[1],), dtype=vol.dtype)
    for dx in (0, 1):
        wx = fx if dx else (1.0 - fx)
        xi = jnp.minimum(x0i + dx, H - 1)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            yi = jnp.minimum(y0i + dy, W - 1)
            for dz in (0, 1):
                wz = fz if dz else (1.0 - fz)
                zi = jnp.minimum(z0i + dz, D - 1)
                corner = _gather_corners(vol_flat, xi, yi, zi, W, D)[0]
                acc = acc + corner * (wx * wy * wz).astype(vol.dtype)
    if mode == "constant":
        acc = jnp.where(inb, acc, 0.0)
    return acc.reshape(out_shape)


# ---------------------------------------------------------------------------
# inverse consistency + composition
# ---------------------------------------------------------------------------

def inverse_consistency(
    disp1: jax.Array, disp2: jax.Array, iters: int = 20
) -> tuple[jax.Array, jax.Array]:
    """Fixed-point symmetrization of forward/backward fields.

    Fields are (3, H, W, D) in **normalized** units (the caller divides by
    ``(n-1)/2`` as the reference does, convex_adam_MIND.py:134,139).  Mirrors
    convex_adam_utils.py:114-129: 0.5 * (phi1 - phi2 ∘ (id + phi1)) with
    ``grid_sample`` defaults (bilinear, zeros, align_corners=False) and the
    identity grid from ``F.affine_grid`` (align_corners=False).
    """
    shape = disp1.shape[1:]
    H, W, D = shape
    n = H * W * D
    identity = identity_grid_normalized(shape, align_corners=False, dtype=disp1.dtype)

    def body(carry, _):
        # both directions batched through ONE stacked-sampler gather per
        # iteration (the loop is launch-bound: 15 iterations x 2 directions
        # x 8 per-corner takes as separate kernels cost ~18 ms at 32^3 on
        # v5e; one 6-channel corner-stack take costs ~a third of that)
        d1, d2 = carry
        g1 = (identity + jnp.moveaxis(d1, 0, -1)).reshape(-1, 3)
        g2 = (identity + jnp.moveaxis(d2, 0, -1)).reshape(-1, 3)
        both = jnp.concatenate([d2, d1], axis=0)  # (6, H, W, D)
        vol8 = build_corner_stack(both)
        pts = jnp.concatenate([g1, g2], axis=0)  # (2n, 3)
        out = _grid_sample_stacked(vol8, pts, False, (6, H, W, D))
        s1 = out[0:3, :n].reshape((3,) + shape)  # d2 ∘ (id + d1)
        s2 = out[3:6, n:].reshape((3,) + shape)  # d1 ∘ (id + d2)
        d1n = 0.5 * (d1 - s1)
        d2n = 0.5 * (d2 - s2)
        return (d1n, d2n), None

    (d1, d2), _ = lax.scan(body, (disp1, disp2), None, length=iters)
    return d1, d2


def compose_displacements(
    disp_1st: jax.Array, disp_2nd: jax.Array, align_corners: bool = False
) -> jax.Array:
    """``disp_2nd + disp_1st ∘ (id + disp_2nd)`` in normalized units.

    Mirrors combineDeformation3d (convex_adam_utils.py:133-135); fields are
    (3, H, W, D) normalized.
    """
    shape = disp_2nd.shape[1:]
    identity = identity_grid_normalized(shape, align_corners, disp_2nd.dtype)
    g = identity + jnp.moveaxis(disp_2nd, 0, -1)
    return disp_2nd + grid_sample_3d(disp_1st, g, align_corners=align_corners)
