"""Pallas kernel parity (interpreter mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from convexadam_tpu.core.cost_volume import correlate
from convexadam_tpu.ops.cost_volume_pallas import (
    correlate_pallas,
    fits_vmem,
)


@pytest.mark.parametrize("q", [1, 2])
@pytest.mark.parametrize("shape", [(4, 8, 8, 8), (3, 16, 24, 10)])
def test_pallas_cost_volume_matches_xla(rng, q, shape):
    fix = rng.standard_normal(shape).astype(np.float32)
    mov = rng.standard_normal(shape).astype(np.float32)
    sp, ap = correlate_pallas(jnp.asarray(fix), jnp.asarray(mov), q, interpret=True)
    sx, ax = correlate(jnp.asarray(fix), jnp.asarray(mov), q)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ap), np.asarray(ax))


def test_vmem_guard():
    # default setting fits; a grid_sp=2-sized coarse volume does not
    assert fits_vmem((12, 32, 32, 32), 4, 4)
    assert not fits_vmem((12, 96, 96, 96), 5, 4)


# ---------------------------------------------------------------------------
# fused corner-reduce kernels (Adam-loop sampler)
# ---------------------------------------------------------------------------

def _corner_case(rng, C=3, n=512, H=6, W=7, D=8):
    block = rng.standard_normal((8 * C, n)).astype(np.float32)
    # fractional coords in [0,1), bases spanning in/out of bounds
    fx = rng.random(n).astype(np.float32)
    fy = rng.random(n).astype(np.float32)
    fz = rng.random(n).astype(np.float32)
    x0 = rng.integers(-2, H + 1, n).astype(np.int32)
    y0 = rng.integers(-2, W + 1, n).astype(np.int32)
    z0 = rng.integers(-2, D + 1, n).astype(np.int32)
    return block, (fx, fy, fz), (x0, y0, z0), (C, H, W, D)


def _xla_weights(fracs, bases, vol_shape):
    (fx, fy, fz), (x0, y0, z0) = fracs, bases
    _, H, W, D = vol_shape
    ws = []
    for dx in (0, 1):
        wx = fx if dx else (1.0 - fx)
        vx = (x0 + dx >= 0) & (x0 + dx < H)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            vy = (y0 + dy >= 0) & (y0 + dy < W)
            for dz in (0, 1):
                wz = fz if dz else (1.0 - fz)
                vz = (z0 + dz >= 0) & (z0 + dz < D)
                ws.append(wx * wy * wz * (vx & vy & vz).astype(np.float32))
    return np.stack(ws)  # (8, n)


def test_corner_reduce_fwd_matches_xla(rng):
    from convexadam_tpu.ops.warp_pallas import corner_reduce_fwd

    block, fracs, bases, vol_shape = _corner_case(rng)
    C = vol_shape[0]
    n = block.shape[1]
    out = np.asarray(
        corner_reduce_fwd(
            jnp.asarray(block), tuple(map(jnp.asarray, fracs)),
            tuple(map(jnp.asarray, bases)), vol_shape, interpret=True,
        )
    )
    w8 = _xla_weights(fracs, bases, vol_shape)
    ref = (block.reshape(8, C, n) * w8[:, None, :]).sum(0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_corner_reduce_fwd_bf16_block(rng):
    from convexadam_tpu.ops.warp_pallas import corner_reduce_fwd

    block, fracs, bases, vol_shape = _corner_case(rng)
    C = vol_shape[0]
    n = block.shape[1]
    b16 = jnp.asarray(block).astype(jnp.bfloat16)
    out = np.asarray(
        corner_reduce_fwd(
            b16, tuple(map(jnp.asarray, fracs)),
            tuple(map(jnp.asarray, bases)), vol_shape, interpret=True,
        )
    )
    w8 = _xla_weights(fracs, bases, vol_shape)
    ref = (np.asarray(b16.astype(jnp.float32)).reshape(8, C, n) * w8[:, None, :]).sum(0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_corner_reduce_bwd_matches_xla(rng):
    from convexadam_tpu.ops.warp_pallas import corner_reduce_bwd

    block, fracs, bases, vol_shape = _corner_case(rng)
    C = vol_shape[0]
    _, H, W, D = vol_shape
    n = block.shape[1]
    ct = rng.standard_normal((C, n)).astype(np.float32)
    dg = np.asarray(
        corner_reduce_bwd(
            jnp.asarray(block), jnp.asarray(ct),
            tuple(map(jnp.asarray, fracs)), tuple(map(jnp.asarray, bases)),
            vol_shape, interpret=True,
        )
    )
    # reference accumulation (core/warp.py:_gs_stacked_bwd XLA path)
    (fx, fy, fz), (x0, y0, z0) = fracs, bases
    cv = np.einsum("cn,kcn->kn", ct, block.reshape(8, C, n))
    dxs = np.zeros(n); dys = np.zeros(n); dzs = np.zeros(n)
    k = 0
    for dx in (0, 1):
        wx = fx if dx else (1.0 - fx)
        vx = (x0 + dx >= 0) & (x0 + dx < H)
        for dy in (0, 1):
            wy = fy if dy else (1.0 - fy)
            vy = (y0 + dy >= 0) & (y0 + dy < W)
            for dz in (0, 1):
                wz = fz if dz else (1.0 - fz)
                vz = (z0 + dz >= 0) & (z0 + dz < D)
                m = (vx & vy & vz).astype(np.float32)
                sx, sy, sz = (1 if dx else -1), (1 if dy else -1), (1 if dz else -1)
                dxs += cv[k] * (sx * wy * wz * m)
                dys += cv[k] * (wx * sy * wz * m)
                dzs += cv[k] * (wx * wy * sz * m)
                k += 1
    np.testing.assert_allclose(dg[0], dxs, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dg[1], dys, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dg[2], dzs, rtol=1e-4, atol=1e-4)


def test_corner_reduce_supported():
    from convexadam_tpu.ops.warp_pallas import corner_reduce_supported

    assert corner_reduce_supported(96 ** 3)
    assert corner_reduce_supported(512)
    assert not corner_reduce_supported(101 * 7)


# ---------------------------------------------------------------------------
# fused MIND-SSC kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("r,d", [(1, 2), (2, 2), (3, 3)])
def test_mind_pallas_matches_xla(rng, r, d):
    """The fused diff+box+min/var kernel must match the XLA mindssc stages
    exactly (incl. the replicate-clamped borders — the round-1 blocker)."""
    from convexadam_tpu.core.features import (
        _mind_shift_pairs,
        shifted_replicate,
    )
    from convexadam_tpu.core.smoothing import avg_pool3d_replicate
    from convexadam_tpu.ops.mind_pallas import mind_ssd_stats_pallas

    H, W, D = 16, 16, 20
    x = jnp.asarray(rng.standard_normal((H, W, D)).astype(np.float32))

    mind_p, var_p = mind_ssd_stats_pallas(x, r, d, interpret=True)

    diffs = []
    for (s1, s2) in _mind_shift_pairs():
        o1 = tuple((c - 1) * d for c in s1)
        o2 = tuple((c - 1) * d for c in s2)
        dd = shifted_replicate(x, o1) - shifted_replicate(x, o2)
        diffs.append(dd * dd)
    ssd = avg_pool3d_replicate(jnp.stack(diffs), 2 * r + 1)
    mind_ref = ssd - jnp.min(ssd, axis=0, keepdims=True)
    var_ref = jnp.mean(mind_ref.astype(jnp.float32), axis=0)

    np.testing.assert_allclose(
        np.asarray(mind_p), np.asarray(mind_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(var_p), np.asarray(var_ref), rtol=1e-5, atol=1e-5
    )


def test_mind_batchable_vmap_matches_per_item(rng):
    """vmap over a batch of volumes must hit the custom_vmap sequential-map
    rule (the kernel's ANY-space specs forbid the default batching rule) and
    bit-match per-item calls."""
    import jax
    from convexadam_tpu.ops.mind_pallas import mind_ssd_stats_batchable

    xs = jnp.asarray(rng.standard_normal((2, 16, 16, 16)).astype(np.float32))
    mind_b, var_b = jax.vmap(
        lambda x: mind_ssd_stats_batchable(x, 1, 2, interpret=True)
    )(xs)
    for i in range(2):
        mind_i, var_i = mind_ssd_stats_batchable(xs[i], 1, 2, interpret=True)
        np.testing.assert_array_equal(np.asarray(mind_b[i]), np.asarray(mind_i))
        np.testing.assert_array_equal(np.asarray(var_b[i]), np.asarray(var_i))


def test_mind_supported():
    from convexadam_tpu.ops.mind_pallas import mind_supported

    assert mind_supported((192, 192, 192), 1, 2, 2)
    assert mind_supported((96, 96, 96), 1, 2, 4)
    assert not mind_supported((100, 100, 100), 1, 2, 4)  # no tile divides


def test_fused_mse_loss_value_and_grad_match_xla(rng):
    """The fused data-term path (_stacked_mse kernels, interpret mode) must
    match value AND gradient of the XLA stacked-sampler composition."""
    import jax
    from convexadam_tpu.core.warp import (
        build_corner_stack,
        warp_ssd_loss_and_grad,
        warp_with_displacement_stacked,
    )

    C, H, W, D = 3, 8, 8, 8
    n = H * W * D
    cost_scale = 7.0
    mov = rng.standard_normal((C, H, W, D)).astype(np.float32)
    fix = rng.standard_normal((C, H, W, D)).astype(np.float32)
    disp = (rng.standard_normal((3, H, W, D)) * 1.5).astype(np.float32)
    stack = build_corner_stack(jnp.asarray(mov))

    def xla_loss(d):
        warped = warp_with_displacement_stacked(stack, (C, H, W, D), d)
        return jnp.mean(
            jnp.mean((warped - jnp.asarray(fix)) ** 2, axis=0) * cost_scale
        )

    ref_val, ref_grad = jax.value_and_grad(xla_loss)(jnp.asarray(disp))

    val, dd = warp_ssd_loss_and_grad(
        stack, (C, H, W, D), jnp.asarray(disp),
        jnp.asarray(fix).reshape(C, -1), cost_scale, interpret=True,
    )
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dd), np.asarray(ref_grad), rtol=1e-4, atol=1e-5
    )


def test_warp_ssd_loss_and_grad_vmap_matches_per_item(rng):
    """vmap over case pairs must route the corner-stack take AND the fused
    kernel through the sequential custom_vmap rules (the default batching
    rules are respectively pathologically slow and program_id-corrupting)
    and match per-item results exactly."""
    import jax
    from convexadam_tpu.core.warp import (
        build_corner_stack,
        warp_ssd_loss_and_grad,
    )

    C, H, W, D = 3, 8, 8, 8
    B = 2
    mov = rng.standard_normal((B, C, H, W, D)).astype(np.float32)
    fix = rng.standard_normal((B, C, H * W * D)).astype(np.float32)
    disp = (rng.standard_normal((B, 3, H, W, D)) * 1.5).astype(np.float32)
    stacks = jax.vmap(build_corner_stack)(jnp.asarray(mov))

    loss_b, dd_b = jax.vmap(
        lambda s, d, f: warp_ssd_loss_and_grad(
            s, (C, H, W, D), d, f, 12.0, interpret=True
        )
    )(stacks, jnp.asarray(disp), jnp.asarray(fix))
    for i in range(B):
        loss_i, dd_i = warp_ssd_loss_and_grad(
            stacks[i], (C, H, W, D), jnp.asarray(disp[i]),
            jnp.asarray(fix[i]), 12.0, interpret=True,
        )
        np.testing.assert_allclose(float(loss_b[i]), float(loss_i), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(dd_b[i]), np.asarray(dd_i))


def test_explicit_grad_step_matches_autodiff(rng):
    """The TPU Adam loop's explicitly-composed gradient (_grad_step_explicit,
    fused kernel + jax.vjp factors) must match jax.value_and_grad of the
    full loss — same ds AND same weight gradient."""
    from convexadam_tpu.core.adam import (
        _grad_step_autodiff,
        _grad_step_explicit,
        resolve_smoother,
    )
    from convexadam_tpu.core.warp import build_corner_stack

    C, H, W, D = 3, 8, 8, 8
    fix = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    mov = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, H, W, D)) * 1.5).astype(np.float32))
    stack = build_corner_stack(mov)
    smooth_fn = resolve_smoother(("box", 3, 3))

    ds_a, g_a = _grad_step_autodiff(
        w, fix, stack, (C, H, W, D), 1.25, smooth_fn, 12.0
    )
    ds_e, g_e = _grad_step_explicit(
        w, fix.reshape(C, -1), stack, (C, H, W, D), 1.25, smooth_fn, 12.0,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ds_e), np.asarray(ds_a), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_e), np.asarray(g_a), rtol=1e-4, atol=1e-6
    )


def test_sequential_vmap_all_closed_over(rng):
    """A vmap where no wrapped argument carries the batch axis (everything
    closed over) must broadcast like the mind_pallas wrapper instead of
    erroring on an empty lax.map."""
    import jax
    from convexadam_tpu.ops.warp_pallas import make_sequential_vmap

    f = make_sequential_vmap(lambda a, b: a * 2.0 + b.sum())
    a = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((3,)).astype(np.float32))
    out = jax.vmap(lambda _: f(a, b))(jnp.arange(6.0))
    assert out.shape == (6, 4, 5)
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(a * 2.0 + b.sum()), (6, 4, 5)),
        rtol=1e-6,
    )


def test_pallas_cost_volume_bf16_feed_bitwise_equals_f32_cast(rng):
    """bf16 features fed to the kernel directly (half DMA/VMEM) must give
    the BITWISE-same cost volume as upcasting the same bf16 values to f32
    first — the kernel's internal .astype(f32) makes them equivalent."""
    from convexadam_tpu.ops.cost_volume_pallas import cost_volume_pallas

    C, h, w, d = 3, 8, 16, 8
    fix = jnp.asarray(
        rng.standard_normal((C, h, w, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    mov = jnp.asarray(
        rng.standard_normal((C, h, w, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    out_bf16 = cost_volume_pallas(fix, mov, 2, interpret=True)
    out_f32 = cost_volume_pallas(
        fix.astype(jnp.float32), mov.astype(jnp.float32), 2, interpret=True
    )
    assert out_bf16.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out_bf16), np.asarray(out_f32))


def test_nearest_sq_pallas_matches_xla(rng):
    """The fused HD95 nearest-neighbour kernel (interpret mode) must equal
    the XLA scan form exactly — integer lattice coords, f32 arithmetic —
    including _COORD_PAD padded rows, and its sequential-vmap wrapper must
    match per-item calls."""
    from convexadam_tpu.core.edt import _COORD_PAD, _nearest_sq
    from convexadam_tpu.ops.edt_pallas import (
        nearest_sq_pallas,
        nearest_sq_pallas_batchable,
    )

    kq, kt = 256, 384
    q = rng.integers(0, 200, (3, kq)).astype(np.float32)
    t = rng.integers(0, 200, (3, kt)).astype(np.float32)
    q[:, -17:] = _COORD_PAD
    t[:, -29:] = _COORD_PAD
    q, t = jnp.asarray(q), jnp.asarray(t)

    ref = np.asarray(_nearest_sq(q, t, chunk=128))
    for bf16 in (False, True):
        out = np.asarray(
            nearest_sq_pallas(q, t, coords_bf16_exact=bf16, interpret=True)
        )
        np.testing.assert_array_equal(out, ref)

    import jax

    qs = jnp.stack([q, q[:, ::-1]])
    ts = jnp.stack([t, t[:, ::-1]])
    out_v = jax.vmap(
        lambda a, b: nearest_sq_pallas_batchable(a, b, interpret=True)
    )(qs, ts)
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(out_v[i]),
            np.asarray(nearest_sq_pallas(qs[i], ts[i], interpret=True)),
        )


def test_nearest_sq_dual_pallas_matches_two_scans(rng):
    """The dual-output kernel's row/column minima must equal two
    independent XLA scans exactly (the shared inner x inner block feeds
    both HD95 directions)."""
    from convexadam_tpu.core.edt import _COORD_PAD, _nearest_sq
    from convexadam_tpu.ops.edt_pallas import nearest_sq_dual_pallas

    kq, kt = 384, 256
    q = rng.integers(0, 200, (3, kq)).astype(np.float32)
    t = rng.integers(0, 200, (3, kt)).astype(np.float32)
    q[:, -11:] = _COORD_PAD
    t[:, -23:] = _COORD_PAD
    q, t = jnp.asarray(q), jnp.asarray(t)

    ref_q = np.asarray(_nearest_sq(q, t, chunk=128))
    ref_t = np.asarray(_nearest_sq(t, q, chunk=128))
    for bf16 in (False, True):
        out_q, out_t = nearest_sq_dual_pallas(
            q, t, coords_bf16_exact=bf16, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(out_q), ref_q)
        np.testing.assert_array_equal(np.asarray(out_t), ref_t)


def test_nearest_sq_pallas_block_skip_exact_on_live_entries(rng):
    """Passing true point counts skips all-pad blocks; entries below the
    query count must still match the XLA scan exactly (pad targets never
    win the min), for both the single and dual kernels."""
    from convexadam_tpu.core.edt import _COORD_PAD, _nearest_sq
    from convexadam_tpu.ops.edt_pallas import (
        nearest_sq_dual_pallas,
        nearest_sq_pallas,
    )

    kq, kt, nq, nt = 512, 640, 300, 200
    q = np.full((3, kq), _COORD_PAD, np.float32)
    t = np.full((3, kt), _COORD_PAD, np.float32)
    q[:, :nq] = rng.integers(0, 200, (3, nq))
    t[:, :nt] = rng.integers(0, 200, (3, nt))
    q, t = jnp.asarray(q), jnp.asarray(t)

    ref_q = np.asarray(_nearest_sq(q, t, chunk=128))
    ref_t = np.asarray(_nearest_sq(t, q, chunk=128))
    out = np.asarray(
        nearest_sq_pallas(
            q, t, jnp.int32(nq), jnp.int32(nt), interpret=True, bq=128,
            bt=128,
        )
    )
    np.testing.assert_array_equal(out[:nq], ref_q[:nq])
    out_q, out_t = nearest_sq_dual_pallas(
        q, t, jnp.int32(nq), jnp.int32(nt), interpret=True, bq=128, bt=128
    )
    np.testing.assert_array_equal(np.asarray(out_q)[:nq], ref_q[:nq])
    np.testing.assert_array_equal(np.asarray(out_t)[:nt], ref_t[:nt])


def test_nearest_sq_dual_head_skip_exact_on_meaningful_ranges(rng):
    """With head_query/head_target the (head x head) corner is skipped;
    per-query outputs past head_query and per-target outputs past
    head_target must still match the XLA scans exactly."""
    from convexadam_tpu.core.edt import _COORD_PAD, _nearest_sq
    from convexadam_tpu.ops.edt_pallas import nearest_sq_dual_pallas

    kq, kt, nq, nt, hq, ht = 512, 512, 400, 450, 250, 300
    q = np.full((3, kq), _COORD_PAD, np.float32)
    t = np.full((3, kt), _COORD_PAD, np.float32)
    q[:, :nq] = rng.integers(0, 200, (3, nq))
    t[:, :nt] = rng.integers(0, 200, (3, nt))
    q, t = jnp.asarray(q), jnp.asarray(t)

    ref_q = np.asarray(_nearest_sq(q, t, chunk=128))
    ref_t = np.asarray(_nearest_sq(t, q, chunk=128))
    out_q, out_t = nearest_sq_dual_pallas(
        q, t, jnp.int32(nq), jnp.int32(nt), jnp.int32(hq), jnp.int32(ht),
        interpret=True, bq=128, bt=128,
    )
    np.testing.assert_array_equal(np.asarray(out_q)[hq:nq], ref_q[hq:nq])
    np.testing.assert_array_equal(np.asarray(out_t)[ht:nt], ref_t[ht:nt])


def test_nearest_sq_pruned_pallas_matches_xla(rng):
    """The bucketed-grid pruned search (proximity-ordered target-block walk
    with bound-based early exit) must equal the XLA scan EXACTLY on every
    meaningful query — for clustered (surface-like) data, scattered data,
    pads, and segment windows.  The bbox bound argument makes no ordering
    assumption, so exactness must hold even for unsorted points."""
    from convexadam_tpu.core.edt import _COORD_PAD, _nearest_sq
    from convexadam_tpu.ops.edt_pallas import nearest_sq_pruned_pallas

    kq, kt = 512, 640
    for case in ("clustered", "scattered"):
        for (lo, hi, nt) in ((0, 420, 500), (200, 420, 500), (0, 512, 640),
                             (100, 100, 500), (0, 420, 0)):
            q = np.full((3, kq), _COORD_PAD, np.float32)
            t = np.full((3, kt), _COORD_PAD, np.float32)
            nq_real = max(hi, 1)
            if case == "clustered":
                # raster-sorted shell points (the real buffer layout)
                zz = np.sort(rng.integers(0, 40, nq_real))
                q[:, :nq_real] = np.stack(
                    [zz, rng.integers(0, 180, nq_real),
                     rng.integers(0, 180, nq_real)]
                )
                zt = np.sort(rng.integers(0, 40, max(nt, 1)))
                t[:, :max(nt, 1)] = np.stack(
                    [zt, rng.integers(0, 180, max(nt, 1)),
                     rng.integers(0, 180, max(nt, 1))]
                )
            else:
                q[:, :nq_real] = rng.integers(0, 1000, (3, nq_real))
                t[:, :max(nt, 1)] = rng.integers(0, 1000, (3, max(nt, 1)))
            if nt == 0:
                t[:] = _COORD_PAD
            qj, tj = jnp.asarray(q), jnp.asarray(t)
            ref = np.asarray(_nearest_sq(qj, tj, chunk=128))
            for bf16 in ((False, True) if case == "clustered" else (False,)):
                out = np.asarray(
                    nearest_sq_pruned_pallas(
                        qj, tj, jnp.int32(lo), jnp.int32(hi), jnp.int32(nt),
                        coords_bf16_exact=bf16 and case == "clustered",
                        interpret=True, bq=128, bt=128,
                    )
                )
                if nt > 0 and hi > lo:
                    np.testing.assert_array_equal(out[lo:hi], ref[lo:hi])


def test_nearest_sq_pruned_pallas_batchable_matches_per_item(rng):
    """The sequential-vmap wrapper must match per-item kernel calls."""
    import jax

    from convexadam_tpu.core.edt import _COORD_PAD
    from convexadam_tpu.ops.edt_pallas import (
        nearest_sq_pruned_pallas,
        nearest_sq_pruned_pallas_batchable,
    )

    kq, kt = 256, 256
    qs = np.full((2, 3, kq), _COORD_PAD, np.float32)
    ts = np.full((2, 3, kt), _COORD_PAD, np.float32)
    for i in range(2):
        qs[i, :, :200] = rng.integers(0, 150, (3, 200))
        ts[i, :, :180] = rng.integers(0, 150, (3, 180))
    qs, ts = jnp.asarray(qs), jnp.asarray(ts)
    los = jnp.asarray([0, 50], jnp.int32)
    his = jnp.asarray([200, 180], jnp.int32)
    nts = jnp.asarray([180, 150], jnp.int32)
    out_v = jax.vmap(
        lambda a, b, lo, hi, nt: nearest_sq_pruned_pallas_batchable(
            a, b, lo, hi, nt, interpret=True
        )
    )(qs, ts, los, his, nts)
    for i in range(2):
        ref = np.asarray(
            nearest_sq_pruned_pallas(
                qs[i], ts[i], los[i], his[i], nts[i], interpret=True
            )
        )
        lo, hi = int(los[i]), int(his[i])
        np.testing.assert_array_equal(
            np.asarray(out_v[i])[lo:hi], ref[lo:hi]
        )


def test_warp_ssd_strided_loss_matches_sublattice_oracle(rng):
    """The strided data term (sample_stride knob) must equal the dense warp
    evaluated on the sub-lattice: warping THEN subsampling is identical to
    sampling at the sub-lattice positions, on both the fused-kernel
    (interpret) and XLA fallback paths."""
    from convexadam_tpu.core.warp import (
        build_corner_stack,
        warp_ssd_loss_and_grad,
        warp_ssd_mean_loss,
        warp_with_displacement_stacked,
    )

    C, H, W, D, s = 3, 16, 8, 16, 2  # sub-lattice 8*4*8 = 256 (kernel tile)
    cost_scale = 7.0
    mov = rng.standard_normal((C, H, W, D)).astype(np.float32)
    fix = rng.standard_normal((C, H, W, D)).astype(np.float32)
    disp = (rng.standard_normal((3, H, W, D)) * 1.5).astype(np.float32)
    stack = build_corner_stack(jnp.asarray(mov))

    warped = warp_with_displacement_stacked(
        stack, (C, H, W, D), jnp.asarray(disp)
    )
    sub = (slice(None), slice(None, None, s), slice(None, None, s),
           slice(None, None, s))
    oracle = float(jnp.mean(
        jnp.mean((warped[sub] - jnp.asarray(fix)[sub]) ** 2, axis=0)
        * cost_scale
    ))

    d_sub = jnp.asarray(disp)[sub]
    f_sub = jnp.asarray(fix)[sub]
    # XLA fallback path (CPU backend in tests)
    loss_xla = warp_ssd_mean_loss(
        stack, (C, H, W, D), d_sub, f_sub, cost_scale, stride=s
    )
    np.testing.assert_allclose(float(loss_xla), oracle, rtol=1e-5)
    # fused kernel path (interpret)
    loss_k, _ = warp_ssd_loss_and_grad(
        stack, (C, H, W, D), d_sub, f_sub.reshape(3, -1), cost_scale,
        interpret=True, stride=s,
    )
    np.testing.assert_allclose(float(loss_k), oracle, rtol=1e-5)


def test_explicit_strided_grad_matches_autodiff(rng):
    """_grad_step_explicit with sample_stride > 1 (fused kernel + zero-pad
    vjp of the strided slice) must match jax.value_and_grad of the strided
    loss."""
    from convexadam_tpu.core.adam import (
        _grad_step_autodiff,
        _grad_step_explicit,
        _sub_lattice,
        resolve_smoother,
    )
    from convexadam_tpu.core.warp import build_corner_stack

    C, H, W, D, s = 3, 16, 16, 8, 2  # sub-lattice 8*8*4 = 256 (kernel tile)
    fix = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    mov = jnp.asarray(rng.standard_normal((C, H, W, D)).astype(np.float32))
    w = jnp.asarray(
        (rng.standard_normal((3, H, W, D)) * 1.5).astype(np.float32)
    )
    stack = build_corner_stack(mov)
    smooth_fn = resolve_smoother(("box", 3, 3))
    fix_sub = _sub_lattice(fix, s)

    ds_a, g_a = _grad_step_autodiff(
        w, fix_sub, stack, (C, H, W, D), 1.25, smooth_fn, 12.0, stride=s
    )
    ds_e, g_e = _grad_step_explicit(
        w, fix_sub.reshape(C, -1), stack, (C, H, W, D), 1.25, smooth_fn,
        12.0, interpret=True, stride=s,
    )
    np.testing.assert_allclose(np.asarray(ds_e), np.asarray(ds_a), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_e), np.asarray(g_a), rtol=1e-4, atol=1e-6
    )
