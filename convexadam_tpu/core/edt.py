"""On-device Euclidean distance transform + HD95.

The reference computes the 95th-percentile Hausdorff distance with a cupy
EDT in a host loop over labels (self_configuring/convexAdam_hyper_util.py:32-51),
which serializes an otherwise-batched sweep.  Here the whole metric runs
inside jit so the sweep engine can evaluate HD95 per (setting, pair) without
leaving the device mesh.

Two facilities:

* :func:`jump_flood_sqdist` — a general squared EDT by jump flooding
  (1+JFA+1 schedule), exact on every tested seed set.  Memory-bound: it
  touches the whole volume ~26x per pass, so it costs ~1 s per 16x128^3
  batch on the ¼-v5e chip — fine for one-off transforms, too slow to call
  4x per label per pair inside a sweep.
* :func:`hd95_device` — HD95 WITHOUT full-volume EDTs.  The percentile only
  samples the distance map at surface voxels, and the nearest
  opposite-class voxel of a mask f, seen from outside (inside), always
  lies on f's inner (outer) surface — the one-step-toward-the-query
  exchange argument.  So the metric reduces to nearest-neighbour queries
  between small integer point sets, evaluated as chunked distance matmuls
  on the MXU (~100x cheaper than flooding, and exact).

Reference HD95 semantics preserved exactly (convexAdam_hyper_util.py:32-51):
* ``dist1 = edt(f) + edt(1-f)`` — distance to the nearest opposite-class
  voxel (one term is always zero);
* ``surf = (edt(f) == 1)`` — foreground voxels with a face-adjacent
  background voxel (squared distance to background exactly 1);
* ``hd95 = max(percentile(dist1[surf2], 95), percentile(dist2[surf1], 95))``
  with numpy's linear-interpolation percentile over sorted surface
  distances;
* a label missing from either volume scores ``missing_value`` (30).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def _pallas_enabled() -> bool:
    """CONVEXADAM_HD95_PALLAS=0 forces the XLA scan search (kill switch for
    the fused kernels; identical results)."""
    return os.environ.get("CONVEXADAM_HD95_PALLAS", "1") != "0"

_SENTINEL = jnp.int32(2**30)  # "no seed known" squared distance
_REL_SENT = 8192  # sentinel relative offset: 3*(8192+512)^2 < 2^31

#: Per-axis volume extent limit of the surface point-set HD95 engine: label
#: buffers move coordinates as ONE packed int32 row (z<<20 | y<<10 | x, see
#: :func:`label_buffers`), so each axis gets 10 bits.  Shared by
#: :func:`surface_lists` (raises beyond it), the sweep engine's mode
#: resolution (selfconfig/engine.py:_resolve_hd95_mode) and the L2R
#: evaluator's host fallback (selfconfig/l2r.py:evaluate_field).
MAX_PACKED_EXTENT = 1024


def _jump_schedule(max_dim: int) -> "list[int]":
    """1+JFA+1: an extra 1-jump pass before and after the halving sequence
    starting at the next power of two >= max_dim/2."""
    jumps = [1]
    j = 1
    while j * 2 < max_dim:
        j *= 2
    while j >= 1:
        jumps.append(j)
        j //= 2
    jumps.append(1)
    return jumps


@jax.jit
def jump_flood_sqdist(seeds: jax.Array) -> jax.Array:
    """Squared Euclidean distance to the nearest True voxel of ``seeds``.

    ``seeds``: (..., H, W, D) bool.  Returns (..., H, W, D) int32 squared
    distances (``2**30`` where a batch slice has no seed at all).  Batch
    dims are flooded independently.

    Each voxel carries the RELATIVE offset of its best seed (int16, no
    coordinate meshes): shifting the state by a jump turns a neighbour's
    offset into a candidate by adding the jump vector.  The pass loop is a
    ``lax.scan`` over the jump schedule — the jump is a traced scalar, the
    shift a dynamic ``jnp.roll`` with wrapped lanes masked by iota bounds —
    keeping the program small for the (remote, slow) TPU compiler.
    """
    shape = seeds.shape
    H, W, D = shape[-3:]
    s = seeds.reshape((-1,) + (H, W, D))

    rel = jnp.where(s[:, None], jnp.int16(0), jnp.int16(_REL_SENT)) * jnp.ones(
        (1, 3, 1, 1, 1), jnp.int16
    )
    d2 = jnp.where(s, jnp.int32(0), _SENTINEL)

    iz = lax.broadcasted_iota(jnp.int32, (H, W, D), 0)
    iy = lax.broadcasted_iota(jnp.int32, (H, W, D), 1)
    ix = lax.broadcasted_iota(jnp.int32, (H, W, D), 2)
    dirs = [
        (a, b, c)
        for a in (-1, 0, 1)
        for b in (-1, 0, 1)
        for c in (-1, 0, 1)
        if (a, b, c) != (0, 0, 0)
    ]
    jumps = jnp.asarray(_jump_schedule(max(H, W, D)), jnp.int32)

    def body(carry, k):
        rel, d2 = carry
        for (a, b, c) in dirs:
            dz, dy, dx = a * k, b * k, c * k
            cand = jnp.roll(rel, (-dz, -dy, -dx), axis=(2, 3, 4))
            cand = cand + jnp.stack([dz, dy, dx]).astype(jnp.int16).reshape(
                1, 3, 1, 1, 1
            )
            valid = (
                (iz + dz >= 0) & (iz + dz < H)
                & (iy + dy >= 0) & (iy + dy < W)
                & (ix + dx >= 0) & (ix + dx < D)
            )
            c32 = cand.astype(jnp.int32)
            cd2 = c32[:, 0] * c32[:, 0] + c32[:, 1] * c32[:, 1] + c32[:, 2] * c32[:, 2]
            # a neighbour that itself knows no seed carries the sentinel
            # offset (~_REL_SENT per axis, squared ~2e8 < 2**30): without
            # this guard a seedless batch slice would return that garbage
            # instead of the documented 2**30 (real offsets are bounded by
            # the volume extent << _REL_SENT/2)
            from_seed = jnp.max(jnp.abs(c32), axis=1) < (_REL_SENT // 2)
            cd2 = jnp.where(valid & from_seed, cd2, _SENTINEL)
            better = cd2 < d2
            d2 = jnp.where(better, cd2, d2)
            rel = jnp.where(better[:, None], cand, rel)
        return (rel, d2), None

    (_, d2), _ = lax.scan(body, (rel, d2), jumps)
    return d2.reshape(shape)


# -- surface-point-set HD95 ---------------------------------------------------
#
# Full-volume EDTs are overkill for HD95: the percentile only samples the
# distance map at SURFACE voxels, and the nearest opposite-class voxel of a
# binary mask f always lies on f's inner surface (seen from outside — the
# step-toward-the-query argument) or outer surface (seen from inside).  So
# the metric reduces to nearest-neighbour queries between small integer
# point sets, which the MXU eats as a chunked -2*Q^T.T distance matmul —
# measured ~100x cheaper than flooding the whole volume per label on the
# ¼-v5e chip (and exact, no JFA failure set).

_COORD_PAD = 8192.0  # padded points: distance² ≥ (8192-512)² — never wins


def _compact(mask_flat: jax.Array, K: int):
    """First K True positions of a flat mask, in raster order.

    One cumsum + one scatter — ``jnp.nonzero(size=K)``'s lowering is far
    more expensive on TPU.  Returns ((K,) int32 indices, -1-padded; true
    count, which may exceed K)."""
    n = mask_flat.shape[0]
    pos = jnp.cumsum(mask_flat.astype(jnp.int32)) - 1
    tgt = jnp.where(mask_flat, pos, K)  # out-of-range rows are dropped
    buf = jnp.full((K,), -1, jnp.int32)
    # fence the scatter operands so the where/cumsum producers cannot fuse
    # into the per-index-bound scatter kernel (measured neutral in the
    # fused whole, like the gather fence in surface_side — cheap insurance)
    buf = buf.at[lax.optimization_barrier(tgt)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    count = jnp.where(mask_flat.shape[0] > 0, pos[-1] + 1, 0)
    return buf, count


def _nearest_sq(
    query: jax.Array,
    target: jax.Array,
    chunk: "int | None" = None,
    coords_bf16_exact: bool = False,
    n_query: "jax.Array | None" = None,
    n_target: "jax.Array | None" = None,
):
    """Per query point, min squared distance to the target set.

    ``query``/``target``: (3, K) f32 integer-valued coords (padded with
    :data:`_COORD_PAD`).  All arithmetic is exact in f32 (coords < 2^11,
    products < 2^24).  The cross term runs on the MXU: with
    ``coords_bf16_exact`` (volume dims <= 256, so every coordinate — and
    the power-of-two pad — is exactly representable in bf16's 8-bit
    mantissa) the default bf16-input / f32-accumulate matmul is EXACT at
    full MXU rate; otherwise f32 precision is forced (bf16 rounding of
    >256 coords would corrupt the integer lattice — the same trap as
    core/rigid.py:_f32_matmuls).
    """
    Kq = query.shape[1]
    Kt = target.shape[1]
    if (
        chunk is None
        and jax.default_backend() == "tpu"
        and Kq % 128 == 0
        and Kt % 128 == 0
        and _pallas_enabled()
    ):
        # fused Pallas path: distance tiles stay in VMEM (cross term on the
        # MXU, norms + min folded in the same pass) instead of the scan
        # below whose (Kq, chunk) blocks round-trip HBM
        from convexadam_tpu.ops.edt_pallas import (  # noqa: PLC0415
            nearest_sq_pallas_batchable,
        )

        return nearest_sq_pallas_batchable(
            query, target, n_query, n_target,
            coords_bf16_exact=coords_bf16_exact,
        )
    if chunk is None:
        # bound the (Kq, chunk) distance block to ~32M f32 (128 MB)
        chunk = max(256, min(2048, (1 << 25) // max(Kq, 1)))
    chunk = min(chunk, Kt)
    n_chunks = -(-Kt // chunk)
    pad = n_chunks * chunk - Kt
    t = jnp.pad(target, ((0, 0), (0, pad)), constant_values=_COORD_PAD)
    t = t.reshape(3, n_chunks, chunk).transpose(1, 0, 2)  # (n, 3, chunk)
    q_norm = jnp.sum(query * query, axis=0)  # (Kq,)

    def body(best, tc):
        t_norm = jnp.sum(tc * tc, axis=0)  # (chunk,)
        if coords_bf16_exact:
            cross = jnp.dot(
                query.T.astype(jnp.bfloat16), tc.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # (Kq, chunk)
        else:
            with jax.default_matmul_precision("float32"):
                cross = jnp.dot(
                    query.T, tc, preferred_element_type=jnp.float32
                )
        d2 = q_norm[:, None] + t_norm[None, :] - 2.0 * cross
        return jnp.minimum(best, jnp.min(d2, axis=1))

    # derive the init from the data so it carries the same manual-sharding
    # ("varying") type as the loop outputs under shard_map
    best0 = jnp.zeros_like(q_norm) + jnp.float32(4.0 * _COORD_PAD * _COORD_PAD)
    if n_target is None:
        best, _ = lax.scan(lambda b, tc: (body(b, tc), None), best0, t)
        return best

    # skip-aware fallback (the Pallas path above skips dead blocks in its
    # grid): bound the trip count by the LIVE target count — chunks
    # entirely past n_target are all-pad and cannot win, so the CPU engine
    # and the CONVEXADAM_HD95_PALLAS=0 kill switch stop paying full K^2.
    # Clamp to the buffer: on cap overflow the TRUE count exceeds Kt and
    # an unclamped bound would re-read the clamped last chunk ~(nt-Kt)/chunk
    # times for nothing (those cases get exactly re-scored later anyway).
    nt = jnp.minimum(jnp.asarray(n_target, jnp.int32), jnp.int32(Kt))

    def cond(st):
        c, _ = st
        return c * chunk < nt

    def wbody(st):
        c, best = st
        return c + 1, body(best, lax.dynamic_index_in_dim(t, c, keepdims=False))

    _, best = lax.while_loop(cond, wbody, (jnp.int32(0), best0))
    return best


def _pruned_search_enabled(K: int) -> bool:
    """Whether :func:`hd95_from_buffers` uses the bucketed-grid pruned
    Pallas search (ops/edt_pallas.py:nearest_sq_pruned_pallas) — the TPU
    default; the CONVEXADAM_HD95_PALLAS=0 kill switch, non-128-multiple
    buffers, and buffers whose whole target set exceeds a safe VMEM
    residency (the pruned kernel keeps ALL (Gj, 3, bt) target blocks
    VMEM-resident at 12 B/point — the tiled dual pass streams any K) fall
    back to the shared-tile dual pass."""
    return (
        jax.default_backend() == "tpu"
        and K % 128 == 0
        and K * 12 <= 6 * 1024 * 1024  # target slab <= 6 MB (~524k points)
        and _pallas_enabled()
    )


def _nearest_sq_pruned(
    query: jax.Array,
    target: jax.Array,
    q_lo: jax.Array,
    q_hi: jax.Array,
    n_target: jax.Array,
    coords_bf16_exact: bool,
    interpret: bool = False,
) -> jax.Array:
    """Thin dispatch to the pruned kernel (kept as a module attribute so
    tests can monkeypatch it to interpret mode off-TPU)."""
    from convexadam_tpu.ops.edt_pallas import (  # noqa: PLC0415
        nearest_sq_pruned_pallas_batchable,
    )

    return nearest_sq_pruned_pallas_batchable(
        query, target, q_lo, q_hi, n_target,
        coords_bf16_exact=coords_bf16_exact, interpret=interpret,
    )


def _nearest_sq_dual(
    query: jax.Array,
    target: jax.Array,
    coords_bf16_exact: bool = False,
    n_query: "jax.Array | None" = None,
    n_target: "jax.Array | None" = None,
    head_query: "jax.Array | None" = None,
    head_target: "jax.Array | None" = None,
):
    """(min sq-dist per query point, min sq-dist per target point) — both
    directions from one pass over the distance tiles on TPU (the fused
    Pallas kernel); two independent scans elsewhere.  The two forms are
    bitwise identical: per cell both compute ``qn + tn - 2*cross`` in f32
    (addition is commutative exactly).  ``n_query``/``n_target`` let the
    kernel skip all-pad blocks; with ``head_query``/``head_target`` the
    caller declares the per-query output meaningful only PAST head_query
    (and per-target past head_target), letting the kernel also skip
    blocks entirely inside the (head x head) corner.  Entries outside the
    meaningful ranges are garbage (callers mask them)."""
    kq = query.shape[1]
    kt = target.shape[1]
    if (
        jax.default_backend() == "tpu"
        and kq % 128 == 0
        and kt % 128 == 0
        and _pallas_enabled()
    ):
        from convexadam_tpu.ops.edt_pallas import (  # noqa: PLC0415
            nearest_sq_dual_pallas_batchable,
        )

        return nearest_sq_dual_pallas_batchable(
            query, target, n_query, n_target, head_query, head_target,
            coords_bf16_exact=coords_bf16_exact,
        )
    # two independent skip-aware passes; each direction's trip count is
    # bounded by ITS live target count (the other set's true size)
    return (
        _nearest_sq(
            query, target, coords_bf16_exact=coords_bf16_exact,
            n_target=n_target,
        ),
        _nearest_sq(
            target, query, coords_bf16_exact=coords_bf16_exact,
            n_target=n_query,
        ),
    )


def _percentile_sorted(vals: jax.Array, n: jax.Array, q: float) -> jax.Array:
    """numpy's linear-interpolated percentile of the first ``n`` entries of
    ascending-sorted ``vals`` (padded tail = +inf)."""
    rank = (q / 100.0) * (n.astype(jnp.float32) - 1.0)
    k = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, None)
    frac = rank - k.astype(jnp.float32)
    k2 = jnp.minimum(k + 1, jnp.maximum(n - 1, 0))
    vk = vals[k]
    vk2 = vals[k2]
    return jnp.where(n > 0, vk + frac * (vk2 - vk), 0.0)


class SurfaceLists(NamedTuple):
    """Compacted all-labels surface lists of a (fixed, moving) volume pair —
    the label-count-independent preamble of :func:`hd95_device`, split out
    so the sweep engine computes it ONCE per pair and shares it across
    label-bucket groups (each bucket used to redo two full-volume neighbour
    stacks + compactions + bincounts)."""

    own_f: jax.Array      # (Kg,) int16 label at each fixed surface voxel (-1 pad)
    nbv_f: jax.Array      # (6, Kg) int16 face-neighbour labels (sentinel pad)
    gc_f: jax.Array       # (3, Kg) f32 coords (_COORD_PAD pad)
    inside_f: jax.Array   # (Kg,) bool: the other volume has the SAME label
    own_m: jax.Array
    nbv_m: jax.Array
    gc_m: jax.Array
    inside_m: jax.Array
    counts_f: jax.Array   # (num_labels+1,) per-label voxel counts
    counts_m: jax.Array
    n_total_f: jax.Array  # scalar TRUE boundary-voxel count (may exceed Kg:
    n_total_m: jax.Array  # the compacted list truncates — overflow guard)


class SurfaceSide(NamedTuple):
    """ONE volume's compacted surface list (the per-volume half of
    :class:`SurfaceLists`).  Split out in round 5 because the FIXED side of
    a sweep is constant across settings and evaluation variants — the
    engine computes it once per pair and shares it (stage-2 scores 16
    variants per setting, so the fixed preamble used to run 16x per
    setting).  The only cross-volume bit, ``inside``, is recomputed per
    variant (one fenced Kg-index gather, :func:`inside_flags`) or packed
    into the word gather when ``seg_other`` is passed."""

    own: jax.Array      # (Kg,) int16 label at each surface voxel (-1 pad)
    nbv: jax.Array      # (6, Kg) int16 face-neighbour labels (sentinel pad)
    gc: jax.Array       # (3, Kg) f32 coords (_COORD_PAD pad)
    inside: jax.Array   # (Kg,) bool (all-False when built w/o ``seg_other``)
    gidx: jax.Array     # (Kg,) int32 compacted flat indices (-1 pad)
    counts: jax.Array   # (num_labels+1,) per-label voxel counts
    n_total: jax.Array  # scalar TRUE boundary count (may exceed Kg)


def surface_side(
    seg: jax.Array,
    num_labels: int,
    global_surface: "int | None" = None,
    seg_other: "jax.Array | None" = None,
) -> SurfaceSide:
    """Full-volume preamble for ONE volume: cumsum+scatter compaction of
    the all-labels surface list (every inner/outer surface voxel of every
    label has a differing face neighbour), the packed-word neighbour
    gather, and per-label voxel counts.

    With ``seg_other`` the agreement bit (surface voxel INSIDE the other
    volume's same-label mask) rides in the packed word — one gather total,
    like the fused pair path.  Without it, ``inside`` is all-False and the
    caller derives it later via :func:`inside_flags` (the sweep engine's
    cached-fixed-side mode)."""
    H, W, D = seg.shape
    if max(H, W, D) > MAX_PACKED_EXTENT:
        raise ValueError(
            f"surface_side supports dims <= {MAX_PACKED_EXTENT} "
            f"(got {(H, W, D)}): label_buffers packs coordinates as "
            "10-bit fields"
        )
    N = H * W * D
    Kg = min(N, 262144) if global_surface is None else min(N, global_surface)
    sg = seg.astype(jnp.int16)

    # Gathers are per-INDEX bound on TPU (~80-90 M idx/s, see core/warp.py),
    # and the surface-list preamble's (6, Kg) neighbour-label gather was its
    # measured hog.  When own + 6 neighbour labels fit one int32 (4-bit
    # fields for <=14 labels: 7*bits <= 31) they are packed full-volume
    # (bandwidth-cheap VPU shifts) and gathered as ONE word per surface
    # voxel — 8x fewer gathered indices.  Field value (2^bits - 1) is an
    # out-of-range sentinel no real label equals.
    bits = (num_labels + 1).bit_length()
    packed = 7 * bits <= 30  # one spare bit for the agreement flag
    fsent = jnp.int32((1 << bits) - 1)
    # a surface voxel of label l is INSIDE the other volume's l-mask iff the
    # volumes agree there — computed full-volume (bandwidth-cheap) and
    # packed/gathered with the word instead of a second per-surface gather
    eq = None
    if seg_other is not None:
        eq = (sg == seg_other.astype(jnp.int16)).reshape(-1)

    nb = _neighbor_stack(sg)
    diff = jnp.any(nb != sg[None], axis=0).reshape(-1)
    gidx, n_total = _compact(diff, Kg)
    gvalid = gidx >= 0
    safe = jnp.maximum(gidx, 0)
    if packed:
        word = sg.astype(jnp.int32)
        for k in range(6):
            word = word | (nb[k].astype(jnp.int32) << (bits * (k + 1)))
        if eq is not None:
            word = word | (
                eq.reshape(sg.shape).astype(jnp.int32) << (7 * bits)
            )
        # fence the take so the unpack shifts/selects below cannot fuse
        # into the gather kernel.  Measured effect in the FUSED whole
        # program: none (surface_lists 68.3 -> 68.0 ms at Kg=782k,
        # scripts/profile_surface_lists.py — the isolated gather+unpack
        # piece reads 31 ms but pieces don't compose; XLA overlaps them) —
        # kept as cheap insurance against future fusion regressions.
        w_raw = lax.optimization_barrier(
            jnp.take(word.reshape(-1), lax.optimization_barrier(safe))
        )
        w = jnp.where(gvalid, w_raw, jnp.int32(-1))
        fmask = jnp.int32((1 << bits) - 1)
        own = jnp.where(gvalid, w & fmask, jnp.int32(-1)).astype(jnp.int16)
        nbv = jnp.stack([
            jnp.where(
                gvalid, (w >> (bits * (k + 1))) & fmask, fsent
            ).astype(jnp.int16)
            for k in range(6)
        ])
        inside = (
            gvalid & (((w >> (7 * bits)) & 1) == 1)
            if eq is not None
            else jnp.zeros_like(gvalid)
        )
    else:
        own = jnp.where(gvalid, sg.reshape(-1)[safe], jnp.int16(-1))
        nbv = jnp.where(
            gvalid[None], nb.reshape(6, -1)[:, safe], jnp.int16(-1)
        )
        inside = (
            gvalid & eq[safe] if eq is not None else jnp.zeros_like(gvalid)
        )
    z = safe // (W * D)
    y = (safe // D) % W
    x = safe % D
    coords = jnp.where(
        gvalid[None], jnp.stack([z, y, x]).astype(jnp.float32), _COORD_PAD
    )

    # compare-and-reduce, not bincount's per-index-bound scatter-add
    from convexadam_tpu.core.features import label_counts  # noqa: PLC0415

    counts = label_counts(sg, num_labels + 1)
    return SurfaceSide(own, nbv, coords, inside, gidx, counts, n_total)


def _neighbor_stack(seg):
    """(6, H, W, D) face-neighbour values (edge-replicated, so borders
    never count as surface against the outside — matching scipy's EDT
    which measures within the array)."""
    outs = []
    for ax in range(3):
        outs.append(jnp.concatenate(
            [seg.take(jnp.asarray([0]), axis=ax), seg], axis=ax
        ).take(jnp.arange(seg.shape[ax]), axis=ax))
        outs.append(jnp.concatenate(
            [seg, seg.take(jnp.asarray([-1]), axis=ax)], axis=ax
        ).take(jnp.arange(1, seg.shape[ax] + 1), axis=ax))
    return jnp.stack(outs)


def inside_flags(
    side: SurfaceSide, seg_self: jax.Array, seg_other: jax.Array
) -> jax.Array:
    """Per-variant agreement bits for a CACHED side: surface voxel of label
    l is inside the other volume's l-mask iff the volumes agree there.
    One fenced Kg-index gather — the cross-volume cost of reusing a fixed
    side across settings/variants instead of rebuilding its whole preamble."""
    eq = (
        seg_self.astype(jnp.int16) == seg_other.astype(jnp.int16)
    ).reshape(-1).astype(jnp.int8)
    gvalid = side.gidx >= 0
    safe = jnp.maximum(side.gidx, 0)
    got = lax.optimization_barrier(
        jnp.take(eq, lax.optimization_barrier(safe))
    )
    return gvalid & (got == 1)


def surface_lists(
    seg_fixed: jax.Array,
    seg_moving: jax.Array,
    num_labels: int,
    global_surface: "int | None" = None,
) -> SurfaceLists:
    """Full-volume preamble of :func:`hd95_device` for a volume PAIR: one
    :func:`surface_side` per volume with the agreement bit packed into the
    word gathers (bit-identical to the pre-split round-4 implementation)."""
    f = surface_side(seg_fixed, num_labels, global_surface, seg_moving)
    m = surface_side(seg_moving, num_labels, global_surface, seg_fixed)
    return SurfaceLists(
        f.own, f.nbv, f.gc, f.inside,
        m.own, m.nbv, m.gc, m.inside,
        f.counts, m.counts, f.n_total, m.n_total,
    )


class LabelBuffers(NamedTuple):
    """Per-label surface point buffers, concatenated along the point axis
    with static per-label offsets (``label_caps`` prefix sums).  Built in
    ONE scatter pass per list from the global :class:`SurfaceLists` —
    the earlier per-label cumsum+scatter sub-compactions cost
    ``4 * len(labels)`` scatters over the Kg-long global list (~3 ms each
    on the ¼-v5e chip), serial in the label count."""

    inner_f: jax.Array   # (3, M) z,y,x; [inside | outside] segments per label
    outer_f: jax.Array   # (3, M)
    inner_m: jax.Array
    outer_m: jax.Array
    n_inner_f: jax.Array  # (num_labels+1,) true inner-surface counts
    n_inner_m: jax.Array
    n_inside_f: jax.Array  # (num_labels+1,) inner voxels INSIDE the other mask
    n_inside_m: jax.Array
    n_outer_f: jax.Array  # (num_labels+1,) true outer-shell counts
    n_outer_m: jax.Array
    counts_f: jax.Array   # (num_labels+1,) per-label voxel counts
    counts_m: jax.Array


def label_buffers(
    pre: SurfaceLists,
    num_labels: int,
    label_caps: "tuple[int, ...]",
) -> LabelBuffers:
    """Partition the global surface lists into per-label buffers.

    ``label_caps``: static (num_labels + 1,) per-label point capacities
    (entry 0 — background — must be 0).  A label's inner surface is a
    partition of the global list by own label; its outer shell may contain
    a voxel once per distinct neighbouring label, so the <=6 neighbour
    slots are expanded with in-voxel dedup.

    Each label's inner list is ordered ``[inside-other-mask | outside]``
    (raster within each segment): inside queries only ever search the
    other volume's OUTER shell and outside queries its INNER surface, so
    the segment boundary (``n_inside_*``) lets the search kernels skip the
    dead sub-blocks.  On cap overflow the inside segment keeps its
    first-cap voxels and the outside segment is truncated/dropped.

    Performance shape (round-4 on-chip profile,
    scripts/profile_label_buffers.py — this function was ~87% of the HD95
    engine and ~2 s/setting of the stage-1 sweep before the redesign):

    * coordinates scatter as ONE packed int32 row (z<<20 | y<<10 | x) —
      a (3, M) column scatter ran at ~22 M idx/s (narrow-axis poison,
      same trap as core/warp.py's (n, 3) grids) while 1-D row scatters
      run ~5x faster; buffers unpack elementwise afterwards;
    * every label-indexed lookup (rank rows, caps, offsets) is a
      compare-select sweep over the <=15 labels instead of a gather —
      take_along_axis on the (L+1, 6 Kg) rank matrix alone was ~90 ms;
    * outer-shell ranks cumsum over a per-voxel (L+1, Kg) hit matrix, not
      the flattened (L+1, 6 Kg) slot matrix: after dedup a voxel
      contributes at most one point per label, so slot rank == rank among
      contributing voxels."""
    inner_f, n_inner_f, n_inside_f = label_buffers_inner(
        pre.own_f, pre.gc_f, pre.inside_f, num_labels, label_caps
    )
    outer_f, n_outer_f = label_buffers_outer(
        pre.own_f, pre.nbv_f, pre.gc_f, num_labels, label_caps
    )
    inner_m, n_inner_m, n_inside_m = label_buffers_inner(
        pre.own_m, pre.gc_m, pre.inside_m, num_labels, label_caps
    )
    outer_m, n_outer_m = label_buffers_outer(
        pre.own_m, pre.nbv_m, pre.gc_m, num_labels, label_caps
    )
    return LabelBuffers(
        inner_f, outer_f, inner_m, outer_m,
        n_inner_f, n_inner_m, n_inside_f, n_inside_m,
        n_outer_f, n_outer_m, pre.counts_f, pre.counts_m,
    )


def _caps_offsets(label_caps):
    offs_host = []
    acc = 0
    for c in label_caps:
        offs_host.append(acc)
        acc += int(c)
    return offs_host, acc


def _pack_coords(gc):
    """(3, K) integer-valued f32 coords → (K,) packed int32.

    PRECONDITION: real coords lie in [0, MAX_PACKED_EXTENT) —
    surface_side raises beyond it, and :func:`caps_overflow` audits
    the range on device for any other SurfaceLists producer (the clamp
    here would otherwise corrupt silently).  Pad rows (_COORD_PAD)
    clamp to 1023 and are only ever written through dropped scatter
    targets."""
    c = jnp.clip(gc.astype(jnp.int32), 0, 1023)
    return (c[0] << 20) | (c[1] << 10) | c[2]


def _unpack_coords(buf):
    """(M,) packed int32 (-1 = empty slot) → (3, M) f32, _COORD_PAD pads."""
    coords = jnp.stack(
        [(buf >> 20) & 1023, (buf >> 10) & 1023, buf & 1023]
    ).astype(jnp.float32)
    return jnp.where(buf[None, :] < 0, _COORD_PAD, coords)


def label_buffers_inner(
    own: jax.Array,
    gc: jax.Array,
    inside: jax.Array,
    num_labels: int,
    label_caps: "tuple[int, ...]",
):
    """One side's INNER buffers: partition by own label with
    [inside | outside] segments (raster within each).  ``inside`` ("in the
    other volume's mask" = the volumes agree at the voxel) is the ONLY
    cross-volume input — per-variant in the sweep engine's cached-side
    mode (:func:`inside_flags`).  Returns (inner (3, M), n_inner,
    n_inside)."""
    offs_host, M = _caps_offsets(label_caps)
    labs_iota = jnp.arange(num_labels + 1, dtype=jnp.int16)
    packed = _pack_coords(gc)
    zeros = jnp.zeros(own.shape, jnp.int32)
    onehot = own[None, :] == labs_iota[:, None]           # (L+1, Kg)
    oh_in = onehot & inside[None, :]
    ranks_in = jnp.cumsum(oh_in.astype(jnp.int32), axis=1) - 1
    ranks_out = jnp.cumsum(
        (onehot & ~inside[None, :]).astype(jnp.int32), axis=1
    ) - 1
    n_inside = ranks_in[:, -1] + 1
    n_inner = n_inside + ranks_out[:, -1] + 1
    # per-voxel values of the own label's rank row / segment base /
    # cap / buffer offset — compare-select over the labels, not gathers
    r_in = zeros
    pos_out = zeros
    cap_own = zeros
    off_own = zeros
    for lab in range(1, num_labels + 1):
        m = own == lab
        r_in = jnp.where(m, ranks_in[lab], r_in)
        pos_out = jnp.where(m, n_inside[lab] + ranks_out[lab], pos_out)
        cap_own = jnp.where(m, label_caps[lab], cap_own)
        off_own = jnp.where(m, offs_host[lab], off_own)
    pos = jnp.where(inside, r_in, pos_out)
    valid = (own >= 1) & (pos < cap_own)
    tgt = jnp.where(valid, off_own + pos, M)
    inner_w = jnp.full((M,), -1, jnp.int32)
    inner_w = inner_w.at[tgt].set(packed, mode="drop")
    return _unpack_coords(inner_w), n_inner, n_inside


def label_buffers_outer(
    own: jax.Array,
    nbv: jax.Array,
    gc: jax.Array,
    num_labels: int,
    label_caps: "tuple[int, ...]",
):
    """One side's OUTER buffers: expand the <=6 neighbour slots with
    in-voxel dedup.  Depends on that side's volume ONLY — constant per
    pair across settings/variants, so the sweep engine caches the fixed
    side's result.  Returns (outer (3, M), n_outer)."""
    offs_host, M = _caps_offsets(label_caps)
    labs_iota = jnp.arange(num_labels + 1, dtype=jnp.int16)
    packed = _pack_coords(gc)
    zeros = jnp.zeros(own.shape, jnp.int32)
    dedup = [jnp.ones(own.shape, bool)]
    for k in range(1, 6):
        seen = nbv[k] == nbv[0]
        for kp in range(1, k):
            seen = seen | (nbv[k] == nbv[kp])
        dedup.append(~seen)
    ovalid = (
        (nbv != own[None])
        & (nbv >= 1)
        & (nbv <= num_labels)
        & jnp.stack(dedup)
        & (own >= 0)[None]
    )                                                     # (6, Kg)
    hit = jnp.zeros((num_labels + 1, own.shape[0]), bool)
    for k in range(6):
        hit = hit | (
            ovalid[k][None, :] & (nbv[k][None, :] == labs_iota[:, None])
        )
    oranks = jnp.cumsum(hit.astype(jnp.int32), axis=1) - 1
    outer_w = jnp.full((M,), -1, jnp.int32)
    for k in range(6):
        rank_k = zeros
        cap_k = zeros
        off_k = zeros
        for lab in range(1, num_labels + 1):
            m = nbv[k] == lab
            rank_k = jnp.where(m, oranks[lab], rank_k)
            cap_k = jnp.where(m, label_caps[lab], cap_k)
            off_k = jnp.where(m, offs_host[lab], off_k)
        ok = ovalid[k] & (rank_k < cap_k)
        otgt = jnp.where(ok, off_k + rank_k, M)
        outer_w = outer_w.at[otgt].set(packed, mode="drop")
    n_outer = oranks[:, -1] + 1
    return _unpack_coords(outer_w), n_outer


def caps_overflow(
    pre: SurfaceLists,
    bufs: LabelBuffers,
    label_caps: "tuple[int, ...]",
) -> jax.Array:
    """Scalar bool: True when ANY buffer silently truncated — a label's
    true inner-surface or outer-shell count exceeds its cap, a volume's
    true boundary-voxel count exceeds the global list capacity (upstream
    truncation makes even the per-label counts unreliable), or a surface
    coordinate falls outside the packed-int32 range (label_buffers' pack
    clamps to [0, MAX_PACKED_EXTENT); surface_lists guards the extent, but
    a foreign SurfaceLists producer would otherwise corrupt silently).
    The sweep engine sizes caps from GT surfaces with finite slack
    (selfconfig/engine.py:_suggest_label_groups); this flag is how an
    outgrown warped surface becomes visible instead of quietly biasing the
    percentile (VERDICT r3 weak#2).

    Every non-background label is audited regardless of its cap: a real
    label accidentally given cap 0 flags (its surface count exceeds 0)
    instead of truncating invisibly; only label 0 — background, never
    buffered — is exempt."""
    capv = jnp.asarray(label_caps, jnp.int32)
    per_label = jnp.maximum(
        jnp.maximum(bufs.n_inner_f, bufs.n_inner_m),
        jnp.maximum(bufs.n_outer_f, bufs.n_outer_m),
    )
    over_lab = jnp.any(per_label[1:] > capv[1:])
    kg = pre.gc_f.shape[1]

    def coords_bad(gc):
        real = gc[0] != _COORD_PAD
        return jnp.any(
            real & jnp.any((gc < 0) | (gc >= MAX_PACKED_EXTENT), axis=0)
        )

    return (
        over_lab
        | (pre.n_total_f > kg) | (pre.n_total_m > kg)
        | coords_bad(pre.gc_f) | coords_bad(pre.gc_m)
    )


def hd95_from_buffers(
    bufs: LabelBuffers,
    label_caps: "tuple[int, ...]",
    max_surface: int,
    missing_value: float = 30.0,
    label_chunk: int = 4,
    labels: "tuple[int, ...]" = (),
    coords_bf16_exact: bool = True,
) -> jax.Array:
    """Per-label HD95 from :class:`LabelBuffers` — the label-bucket half of
    :func:`hd95_device` (see there for semantics).  Every label in
    ``labels`` must have ``label_caps[lab] == max_surface`` (the sweep
    engine's buckets group labels by capacity).  ``coords_bf16_exact``
    must only be set when every volume dim is <= 256 (bf16's 8-bit
    mantissa covers the integer lattice exactly)."""
    K = max_surface
    bf16ok = coords_bf16_exact
    for lab in labels:
        if label_caps[lab] != K:
            raise ValueError(
                f"label {lab} has cap {label_caps[lab]} != bucket K {K}"
            )
    offs = jnp.asarray(_caps_offsets(label_caps)[0], jnp.int32)
    iota_k = jnp.arange(K, dtype=jnp.int32)

    def one_label(lab):
        off = offs[lab]
        ci_f = lax.dynamic_slice(bufs.inner_f, (0, off), (3, K))
        ci_m = lax.dynamic_slice(bufs.inner_m, (0, off), (3, K))
        co_f = lax.dynamic_slice(bufs.outer_f, (0, off), (3, K))
        co_m = lax.dynamic_slice(bufs.outer_m, (0, off), (3, K))
        n_f = bufs.n_inner_f[lab]
        n_m = bufs.n_inner_m[lab]
        # segment boundary clamps to the cap (overflow keeps inside-first)
        in_f = jnp.minimum(bufs.n_inside_f[lab], K)
        in_m = jnp.minimum(bufs.n_inside_m[lab], K)

        # Each direction's queries are the OTHER volume's inner surface:
        # queries INSIDE this volume's mask (the buffer's head segment)
        # need its outer shell, queries outside (the tail segment) its
        # inner surface — the segment boundary drives block skipping and a
        # positional select.
        if _pruned_search_enabled(K):
            # bucketed-grid pruned search (ops/edt_pallas.py): each of the
            # four direction/segment searches walks target blocks in bbox
            # proximity order with an exact early exit — for the HD95
            # regime (matching surfaces a few voxels apart) it touches
            # O(1) target slabs per query slab instead of the full K x K
            # sweep, so pruning replaces the shared-tile dual pass
            zero = jnp.int32(0)
            d_in_m = _nearest_sq_pruned(
                ci_m, ci_f, in_m, jnp.minimum(n_m, K), n_f, bf16ok
            )
            d_in_f = _nearest_sq_pruned(
                ci_f, ci_m, in_f, jnp.minimum(n_f, K), n_m, bf16ok
            )
            d_out_m = _nearest_sq_pruned(
                ci_m, co_f, zero, in_m, bufs.n_outer_f[lab], bf16ok
            )
            d_out_f = _nearest_sq_pruned(
                ci_f, co_m, zero, in_f, bufs.n_outer_m[lab], bf16ok
            )
        else:
            # shared inner x inner distance block: direction 1 takes its
            # row minima and direction 2 its column minima from one pass,
            # and only its (outside_m rows | outside_f cols) sub-blocks
            # are live — a label costs
            # n_m*n_f - in_m*in_f + in_m*n_out_f + in_f*n_out_m cells
            # instead of 4 K^2
            d_in_m, d_in_f = _nearest_sq_dual(
                ci_m, ci_f, coords_bf16_exact=bf16ok,
                n_query=n_m, n_target=n_f,
                head_query=in_m, head_target=in_f,
            )
            d_out_m = _nearest_sq(
                ci_m, co_f, coords_bf16_exact=bf16ok,
                n_query=in_m, n_target=bufs.n_outer_f[lab],
            )
            d_out_f = _nearest_sq(
                ci_f, co_m, coords_bf16_exact=bf16ok,
                n_query=in_f, n_target=bufs.n_outer_m[lab],
            )

        def directed(d_in, d_out, n_inside, n_q):
            """p95 of dist-to-nearest-opposite-class-of-other over the
            query surface (the other volume's label-``lab`` inner
            surface)."""
            d2 = jnp.where(iota_k < n_inside, d_out, d_in)
            d = jnp.where(iota_k < n_q, jnp.sqrt(d2), jnp.inf)
            # truncated surfaces: first-K bias
            n_eff = jnp.minimum(n_q, K)
            return _percentile_sorted(jnp.sort(d), n_eff, 95.0)

        p1 = directed(d_in_m, d_out_m, in_m, n_m)
        p2 = directed(d_in_f, d_out_f, in_f, n_f)
        hd = jnp.maximum(p1, p2)
        present = (bufs.counts_f[lab] > 0) & (bufs.counts_m[lab] > 0)
        return jnp.where(present, hd, missing_value)

    n_out = len(labels)
    labs = jnp.asarray(labels, jnp.int32)
    chunked = label_chunk > 1 and n_out % label_chunk == 0
    if n_out == 1:
        out = one_label(labs[0])
    elif chunked:
        out = lax.map(
            jax.vmap(one_label), labs.reshape(-1, label_chunk)
        )
    else:
        out = lax.map(one_label, labs)
    return out.reshape(-1)[:n_out].astype(jnp.float32)


def surface_stats(seg, num_labels: int):
    """Host-side per-label surface sizing of one volume: returns
    ``(need, total)`` where ``need[lab] = max(inner surface, outer shell)``
    voxel counts (the two buffers :func:`label_buffers` fills per label —
    a 1-voxel-thick structure's outer shell EXCEEDS its inner surface, so
    inner counts alone under-size) and ``total`` is the all-labels
    boundary-voxel count bounding the global surface list."""
    import numpy as np  # noqa: PLC0415 (host-side sizing)

    seg = np.asarray(seg)
    nb = []
    for ax in range(3):
        for sh in (1, -1):
            r = np.roll(seg, sh, ax)
            sl = tuple(
                slice(0, 1) if (i == ax and sh == 1)
                else (slice(-1, None) if (i == ax and sh == -1)
                      else slice(None))
                for i in range(3)
            )
            r[sl] = seg[sl]
            nb.append(r)
    nb = np.stack(nb)
    diff = (nb != seg[None]).any(0)
    idx = np.flatnonzero(diff.ravel())
    own = seg.ravel()[idx].astype(np.int64)
    nbl = nb.reshape(6, -1)[:, idx].astype(np.int64)
    inner = np.bincount(
        own[(own >= 1) & (own <= num_labels)], minlength=num_labels + 1
    )
    # outer shell: dedup neighbour labels within a voxel (matching
    # label_buffers' <=6-slot expansion), exclude own label
    keep = np.ones(nbl.shape, bool)
    for k in range(1, 6):
        for kp in range(k):
            keep[k] &= nbl[k] != nbl[kp]
    keep &= (nbl != own[None]) & (nbl >= 1) & (nbl <= num_labels)
    outer = np.bincount(nbl[keep], minlength=num_labels + 1)
    return np.maximum(inner, outer), int(idx.size)


def suggest_hd95_caps(
    seg_fixed,
    seg_moving,
    num_labels: int,
) -> "tuple[tuple[tuple[tuple[int, ...], int], ...], int]":
    """EXACT buffer sizing for the surface point-set HD95, from host numpy
    segmentations.

    Returns ``(groups, global_cap)`` where ``groups`` is a tuple of
    ``(labels, K)`` buckets (K a multiple of 4096 covering every bucketed
    label's inner surface AND outer shell in BOTH volumes — a 1-voxel-thick
    structure's outer shell exceeds its inner surface, so inner counts
    alone under-size) and ``global_cap`` covers each volume's all-labels
    surface list.  With these caps :func:`hd95_device` /
    :func:`hd95_from_buffers` are exact: nothing truncates.

    Unlike the sweep engine's GT-only heuristic (which adds slack because
    warped surfaces are unknown when it sizes), this measures the two
    volumes actually being compared — use it for per-case evaluation
    (selfconfig/l2r.py:evaluate_field) where both segs are on the host
    anyway.

    Caps round up to power-of-two MULTIPLES OF 4096 (4096, 8192, 16384, …),
    not the sweep engine's 4096 granularity: this function runs per case —
    per VARIANT in a validation grid — and every distinct ``groups`` tuple
    is a new static jit signature costing a 30 s–5 min remote compile on
    TPU.  Coarse rounding makes repeat signatures (= compile-cache hits)
    the common case, at worst ~2x extra search cells on a bucket — cheap
    MXU work against minutes of compiler wall-clock."""
    need_f, tot_f = surface_stats(seg_fixed, num_labels)
    need_m, tot_m = surface_stats(seg_moving, num_labels)
    import numpy as np  # noqa: PLC0415 (host-side sizing)

    def round_pow2_4096(n: int) -> int:
        k = 4096
        while k < n:
            k *= 2
        return k

    need = np.maximum(need_f, need_m)
    n_vox = int(np.asarray(seg_fixed).size)
    cap_max = round_pow2_4096(n_vox)
    buckets: dict = {}
    for lab in range(1, num_labels + 1):
        k = min(round_pow2_4096(max(int(need[lab]), 1)), cap_max)
        buckets.setdefault(k, []).append(lab)
    groups = tuple(
        (tuple(labs), k) for k, labs in sorted(buckets.items())
    )
    global_cap = min(round_pow2_4096(max(tot_f, tot_m, 1)), cap_max)
    return groups, global_cap


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_labels", "groups", "global_surface", "missing_value",
        "label_chunk", "bf16ok",
    ),
)
def _hd95_bucketed(
    seg_fixed: jax.Array,
    seg_moving: jax.Array,
    num_labels: int,
    groups,
    global_surface: int,
    missing_value: float,
    label_chunk: int,
    bf16ok: bool,
) -> jax.Array:
    pre = surface_lists(seg_fixed, seg_moving, num_labels, global_surface)
    caps_l = [0] * (num_labels + 1)
    for labs, k in groups:
        for lab in labs:
            caps_l[lab] = k
    caps = tuple(caps_l)
    bufs = label_buffers(pre, num_labels, caps)
    parts = [
        hd95_from_buffers(
            bufs, caps, k, missing_value, label_chunk, labs,
            coords_bf16_exact=bf16ok,
        )
        for labs, k in groups
    ]
    order = [lab for labs, _ in groups for lab in labs]
    inv = [0] * len(order)
    for i, lab in enumerate(order):
        inv[lab - 1] = i
    return jnp.concatenate(parts)[jnp.asarray(inv, jnp.int32)]


def hd95_device_sized(
    seg_fixed,
    seg_moving,
    num_labels: int,
    missing_value: float = 30.0,
    label_chunk: int = 4,
) -> jax.Array:
    """:func:`hd95_device` with caps measured EXACTLY from the two host
    volumes (:func:`suggest_hd95_caps`) and per-size label buckets — no
    silent truncation at any scale, small organs pay small K x K searches.
    Use for per-case evaluation where both segmentations are host arrays;
    the sweep engine keeps its own GT-sized batched path.  Same 1024-per-
    axis extent limit as :func:`hd95_device` (packed int32 coordinates)."""
    groups, global_cap = suggest_hd95_caps(seg_fixed, seg_moving, num_labels)
    shape = tuple(jnp.shape(seg_fixed))
    return _hd95_bucketed(
        jnp.asarray(seg_fixed), jnp.asarray(seg_moving), num_labels,
        groups, global_cap, missing_value, label_chunk,
        bf16ok=max(shape) <= 256,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_labels", "label_chunk", "max_surface", "global_surface", "labels"
    ),
)
def hd95_device(
    seg_fixed: jax.Array,
    seg_moving: jax.Array,
    num_labels: int,
    missing_value: float = 30.0,
    label_chunk: int = 4,
    max_surface: "int | None" = None,
    global_surface: "int | None" = None,
    labels: "tuple[int, ...] | None" = None,
) -> jax.Array:
    """Per-label HD95 between integer label volumes, fully on device.

    Drop-in for :func:`convexadam_tpu.core.metrics.hd95` (the host-EDT
    loop) with the reference's semantics (convexAdam_hyper_util.py:32-51);
    exact as long as no single label surface exceeds ``max_surface`` voxels
    and the union of all label surfaces fits ``global_surface`` (default
    ``4 * max_surface``).  Volume extents are limited to 1024 per axis by
    the packed int32 (z<<20 | y<<10 | x) surface-coordinate row
    (:func:`surface_lists` raises beyond that); fall back to the host
    :func:`~convexadam_tpu.core.metrics.hd95` for larger grids.  The default is exact for volumes up to 64k
    voxels (K = |volume|) and caps K at 65536 beyond that — a 192^3 organ
    surface is ~60k voxels, so anatomy fits; an overflowing surface is
    truncated to its first K voxels in raster order (the percentile sees a
    subset, the nearest-target search overestimates) — raise
    ``max_surface`` if that regime matters.  ``label_chunk`` labels are
    evaluated per sequential step (vmapped within a step when it divides
    num_labels).

    Composed from :func:`surface_lists` (full-volume preamble, label-count
    independent), :func:`label_buffers` (per-label partition, one scatter
    pass per list) and :func:`hd95_from_buffers` (per-label K x K
    searches) — callers evaluating several label buckets over the SAME
    pair should run the first two once and fan out (the sweep engine
    does).

    ``labels``: optional static tuple restricting evaluation to a subset
    (the sweep engine buckets labels by surface size so small organs pay
    small K x K searches, not the largest label's).  Returns
    (len(labels),) in the given order; default labels = 1..num_labels.

    Returns (num_labels,) float32 for labels 1..num_labels.
    """
    H, W, D = seg_fixed.shape
    N = H * W * D
    if max_surface is None:
        max_surface = min(N, 65536)
    # ``global_surface`` caps the ALL-labels surface list; it must cover the
    # total boundary-voxel count or sub-surfaces get truncated even when
    # each fits K (the sweep engine sizes both from the data)
    if global_surface is None:
        global_surface = 4 * max_surface
    pre = surface_lists(seg_fixed, seg_moving, num_labels, global_surface)
    if labels is None:
        labels = tuple(range(1, num_labels + 1))
    caps = (0,) + (max_surface,) * num_labels
    bufs = label_buffers(pre, num_labels, caps)
    # bf16 coords are exact up to 256 (8-bit mantissa) → full-rate MXU
    return hd95_from_buffers(
        bufs, caps, max_surface, missing_value, label_chunk, labels,
        coords_bf16_exact=max(H, W, D) <= 256,
    )
