"""Pallas TPU kernel for the HD95 surface nearest-neighbour search.

:func:`convexadam_tpu.core.edt.hd95_device` reduces the reference's
full-volume EDT HD95 (self_configuring/convexAdam_hyper_util.py:32-51) to
min-squared-distance queries between compacted surface point sets, which
dominate the sweep's metric cost (the search is quadratic in the point
count).  The XLA form (core/edt.py:_nearest_sq) is a ``lax.scan`` of
``(Kq, 3) @ (3, chunk)`` dots whose ``(Kq, chunk)`` distance blocks
round-trip HBM between the matmul and the min-reduction.  This kernel
keeps each distance tile in VMEM: cross term on the MXU, norms + min
folded in the same pass, so HBM sees only the (3, K) coordinate rows and
the (K,) running minimum.

Exactness matches ``_nearest_sq``: coordinates are integer-valued f32;
with ``coords_bf16_exact`` (every dim <= 256 so the 8-bit mantissa covers
the lattice and the power-of-two pad) the cross term runs as bf16 inputs /
f32 accumulate at full MXU rate, otherwise f32 precision is forced (same
trap as core/rigid.py:_f32_matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACC_INIT = 4.0 * 8192.0 * 8192.0  # > any real padded distance (see edt._COORD_PAD)
_COORD_PAD = 8192.0  # mirrors edt._COORD_PAD (circular-import-free)


def _block_d2(q, t, bf16):
    """(BT, BQ) squared distances: queries on the LANE axis so the min
    folds across sublanes and the running minimum writes as a plain
    (1, BQ) row."""
    qn = jnp.sum(q * q, axis=0)  # (BQ,)
    tn = jnp.sum(t * t, axis=0)  # (BT,)
    if bf16:
        cross = lax.dot_general(
            t.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        cross = lax.dot_general(
            t, q, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    return tn[:, None] + qn[None, :] - 2.0 * cross


def _kernel(nq_ref, nt_ref, q_ref, t_ref, out_ref, *, bf16: bool,
            bq: int, bt: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Padded points sit at the buffer tails, so whole dead blocks skip the
    # MXU/VPU work: pad targets (coords = _COORD_PAD) never win the min and
    # pad queries are masked by the caller — the skip is exact, and buffer
    # rounding slack multiplies in BOTH factors of the K x K search.
    live = (i * bq < nq_ref[0, 0]) & (j * bt < nt_ref[0, 0])

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.full_like(out_ref[...], _ACC_INIT)

    @pl.when(live)
    def _acc():
        m = jnp.min(_block_d2(q_ref[...], t_ref[...], bf16), axis=0)[None, :]
        out_ref[...] = jnp.minimum(out_ref[...], m)


@functools.partial(
    jax.jit, static_argnames=("coords_bf16_exact", "interpret", "bq", "bt")
)
def nearest_sq_pallas(
    query: jax.Array,
    target: jax.Array,
    n_query: "jax.Array | None" = None,
    n_target: "jax.Array | None" = None,
    coords_bf16_exact: bool = False,
    interpret: bool = False,
    bq: "int | None" = None,
    bt: "int | None" = None,
) -> jax.Array:
    """Per query point, min squared distance to the target set.

    ``query``/``target``: (3, Kq)/(3, Kt) f32 with K multiples of 256
    (the sweep engine's buckets are multiples of 4096).  ``n_query`` /
    ``n_target``: optional scalar true point counts — blocks entirely past
    them are skipped (exact: the tails are _COORD_PAD points).  Entries at
    or past ``n_query`` are NOT meaningful distances when the skip fires
    (the caller masks them).  Returns (Kq,) f32.
    """
    _, kq = query.shape
    _, kt = target.shape
    bq = _pick_block(kq) if bq is None else bq
    bt = _pick_block(kt) if bt is None else bt
    nq = jnp.full((1, 1), kq, jnp.int32) if n_query is None else (
        jnp.asarray(n_query, jnp.int32).reshape(1, 1)
    )
    nt = jnp.full((1, 1), kt, jnp.int32) if n_target is None else (
        jnp.asarray(n_target, jnp.int32).reshape(1, 1)
    )
    kernel = functools.partial(_kernel, bf16=coords_bf16_exact, bq=bq, bt=bt)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, kq), jnp.float32),
        grid=(kq // bq, kt // bt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(nq, nt, query, target)
    return out.reshape(kq)


def _pick_block(k: int, cap: int = 1024) -> int:
    # (BT, BQ) f32 distance tile: 1024 x 1024 = 4 MB of VMEM
    b = min(k, cap)
    while k % b:
        b //= 2
    return max(b, 128)


def _dual_kernel(nq_ref, nt_ref, hq_ref, ht_ref, q_ref, t_ref,
                 outq_ref, outt_ref, *, bf16: bool, bq: int, bt: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    # tails past the true counts are all-pad; the (head_q x head_t) corner
    # is declared dead by the caller (its per-query outputs are only read
    # past head_q and per-target outputs past head_t)
    live = (
        (i * bq < nq_ref[0, 0])
        & (j * bt < nt_ref[0, 0])
        & (
            ((i + 1) * bq > hq_ref[0, 0])
            | ((j + 1) * bt > ht_ref[0, 0])
        )
    )

    @pl.when(j == 0)
    def _init_q():
        outq_ref[...] = jnp.full_like(outq_ref[...], _ACC_INIT)

    # the per-target output is one VMEM-resident (1, Kt) accumulator
    # (constant index map) rather than per-(j, i) slots: a (BT, 1) slot
    # block is an illegal Mosaic tiling (lane dim 1 is neither the array
    # dim nor 128-divisible), whereas lane-dim dynamic slices at
    # 128-multiple offsets (j*bt) are fine.  Dead tiles simply skip the
    # update (pads keep _ACC_INIT — same semantics as the old explicit
    # dead-slot writes).
    @pl.when((i == 0) & (j == 0))
    def _init_t():
        outt_ref[...] = jnp.full_like(outt_ref[...], _ACC_INIT)

    @pl.when(live)
    def _acc():
        d2 = _block_d2(q_ref[...], t_ref[...], bf16)  # (BT, BQ)
        outq_ref[...] = jnp.minimum(
            outq_ref[...], jnp.min(d2, axis=0)[None, :]
        )
        sl = pl.ds(j * bt, bt)
        outt_ref[:, sl] = jnp.minimum(
            outt_ref[:, sl], jnp.min(d2, axis=1)[None, :]
        )


@functools.partial(
    jax.jit, static_argnames=("coords_bf16_exact", "interpret", "bq", "bt")
)
def nearest_sq_dual_pallas(
    query: jax.Array,
    target: jax.Array,
    n_query: "jax.Array | None" = None,
    n_target: "jax.Array | None" = None,
    head_query: "jax.Array | None" = None,
    head_target: "jax.Array | None" = None,
    coords_bf16_exact: bool = False,
    interpret: bool = False,
    bq: "int | None" = None,
    bt: "int | None" = None,
) -> tuple:
    """Both directions from ONE pass over the distance tiles: returns
    (per-query min sq-dist to target set, per-target min sq-dist to query
    set).  The HD95 inner-surface block ``d(ci_m, ci_f)`` feeds direction 1
    row-wise and direction 2 column-wise, so sharing it cuts the per-label
    search from 4 K^2 to 3 K^2 cells.  ``n_query``/``n_target`` skip dead
    pad blocks as in :func:`nearest_sq_pallas`; ``head_query`` /
    ``head_target`` additionally declare the (head x head) corner dead:
    per-query outputs are then meaningful only at positions in
    [head_query, n_query) and per-target outputs in [head_target,
    n_target)."""
    _, kq = query.shape
    _, kt = target.shape
    bq = _pick_block(kq) if bq is None else bq
    bt = _pick_block(kt) if bt is None else bt
    gi, gj = kq // bq, kt // bt

    def scalar(v, default):
        return jnp.full((1, 1), default, jnp.int32) if v is None else (
            jnp.asarray(v, jnp.int32).reshape(1, 1)
        )

    nq = scalar(n_query, kq)
    nt = scalar(n_target, kt)
    hq = scalar(head_query, 0)
    ht = scalar(head_target, 0)
    kernel = functools.partial(
        _dual_kernel, bf16=coords_bf16_exact, bq=bq, bt=bt
    )
    smem = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    outq, outt = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, kq), jnp.float32),
            jax.ShapeDtypeStruct((1, kt), jnp.float32),
        ),
        grid=(gi, gj),
        in_specs=[
            smem, smem, smem, smem,
            pl.BlockSpec((3, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            # whole-array resident accumulator (see _dual_kernel)
            pl.BlockSpec((1, kt), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(nq, nt, hq, ht, query, target)
    return outq.reshape(kq), outt.reshape(kt)


def _pruned_kernel(lo_ref, hi_ref, perm_ref, dmin_ref, q_ref, t_ref,
                   out_ref, *, bf16: bool, bq: int, bt: int, gj: int):
    """One query block against target blocks in PROXIMITY order with an
    exact bound-based early exit (see :func:`nearest_sq_pruned_pallas`)."""
    i = pl.program_id(0)
    lo = lo_ref[0, 0]
    hi = hi_ref[0, 0]
    idx = i * bq + lax.broadcasted_iota(jnp.int32, (1, bq), 1)
    meaningful = (idx >= lo) & (idx < hi)
    out_ref[...] = jnp.full((1, bq), _ACC_INIT, jnp.float32)
    live_q = (i * bq < hi) & ((i + 1) * bq > lo)

    @pl.when(live_q)
    def _run():
        q = q_ref[...]

        def cond(st):
            j, bound = st
            # dmin is ascending: the first rank whose bbox lower bound
            # exceeds the running max-of-mins ends the walk EXACTLY (no
            # later block can improve any meaningful query).  The read is
            # clamped because & does not short-circuit: at j == gj the
            # conjunction is already False, but the ref access must stay
            # in bounds.
            d = dmin_ref[0, 0, jnp.minimum(j, gj - 1)]
            return (j < gj) & (d <= bound)

        def body(st):
            j, bound = st
            jj = perm_ref[0, 0, j]
            d2 = _block_d2(q, t_ref[jj], bf16)  # (bt, bq)
            cur = jnp.minimum(
                out_ref[...], jnp.min(d2, axis=0)[None, :]
            )
            out_ref[...] = cur
            # bound over MEANINGFUL queries only: dead/pad entries hold
            # _ACC_INIT forever and would disable pruning
            bound = jnp.max(jnp.where(meaningful, cur, -1.0))
            return j + 1, bound

        lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(_ACC_INIT)))


@functools.partial(
    jax.jit, static_argnames=("coords_bf16_exact", "interpret", "bq", "bt")
)
def nearest_sq_pruned_pallas(
    query: jax.Array,
    target: jax.Array,
    q_lo: jax.Array,
    q_hi: jax.Array,
    n_target: jax.Array,
    coords_bf16_exact: bool = False,
    interpret: bool = False,
    bq: "int | None" = None,
    bt: "int | None" = None,
) -> jax.Array:
    """Bucketed-grid exact nearest-neighbour search: per query point in
    ``[q_lo, q_hi)``, min squared distance to the live targets.

    The quadratic tile sweep of :func:`nearest_sq_pallas` pays every
    (query block x target block) tile.  Surface buffers are raster-ordered
    (core/edt.py:label_buffers scatters by raster rank), so a block of
    consecutive points is a spatially compact z-slab — its axis-aligned
    bounding box gives an EXACT lower bound on any cross-block point
    distance.  Per query block this precomputes (in XLA, cheap) the bbox
    min-squared-distance to every target block and its ascending order;
    the kernel then walks target blocks in that order, maintaining the
    block's max-of-current-mins as an upper bound, and stops at the first
    rank whose bbox bound exceeds it — every later block is provably
    unable to improve any query.  For closely matching surfaces (the HD95
    regime: warped vs fixed organ boundaries a few voxels apart) this
    visits O(1) target slabs per query slab instead of all of them.

    The whole target set stays VMEM-resident ((Gj, 3, bt) with a constant
    index map, <= 3 MB at the 262144-point engine cap), so visited tiles
    are pure MXU/VPU compute — the walk order is data-dependent, which a
    BlockSpec index map cannot express.

    ``query``/``target``: (3, K) f32, K a multiple of ``bq``/``bt``
    (pads = _COORD_PAD sort behind every live block and never win a min).
    Entries outside ``[q_lo, q_hi)`` are NOT meaningful (callers mask
    them); target blocks entirely at or past ``n_target`` are skipped.
    Exactness matches :func:`nearest_sq_pallas` bitwise: identical
    ``_block_d2`` tiles, and min is order-independent.
    """
    _, kq = query.shape
    _, kt = target.shape
    bq = _pick_block(kq, 512) if bq is None else bq
    bt = _pick_block(kt, 512) if bt is None else bt
    gi, gj = kq // bq, kt // bt

    big = jnp.float32(2.0 * _COORD_PAD)

    def boxes(pts, nb, b):
        p = pts.reshape(3, nb, b)
        real = p[0:1] < _COORD_PAD  # pads sit at exactly _COORD_PAD
        mn = jnp.min(jnp.where(real, p, big), axis=2)
        mx = jnp.max(jnp.where(real, p, -big), axis=2)
        return mn, mx

    qmn, qmx = boxes(query, gi, bq)
    tmn, tmx = boxes(target, gj, bt)
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            qmn[:, :, None] - tmx[:, None, :],
            tmn[:, None, :] - qmx[:, :, None],
        ),
    )
    dmin = jnp.sum(gap * gap, axis=0)  # (Gi, Gj)
    # blocks entirely past the live target count are dead even though their
    # leading entries may be real (overflow truncation keeps them out);
    # all-pad blocks already carry a huge bbox gap
    dead_t = (jnp.arange(gj, dtype=jnp.int32) * bt) >= jnp.asarray(
        n_target, jnp.int32
    )
    dmin = jnp.where(dead_t[None, :], jnp.float32(3.0e38), dmin)
    order = jnp.argsort(dmin, axis=1).astype(jnp.int32)  # (Gi, Gj)
    dsort = jnp.take_along_axis(dmin, order, axis=1)
    # SMEM rows ride as (Gi, 1, Gj) with (1, 1, Gj) blocks: Mosaic requires
    # each of the last two block dims to be (8,128)-divisible OR equal to
    # the array dim — a (1, Gj) row of a (Gi, Gj) array satisfies neither
    # in dim -2 (observed lowering failure on-chip)
    order = order[:, None, :]
    dsort = dsort[:, None, :]
    t3 = target.reshape(3, gj, bt).transpose(1, 0, 2)  # (Gj, 3, bt)

    def scal(v):
        return jnp.asarray(v, jnp.int32).reshape(1, 1)

    kernel = functools.partial(
        _pruned_kernel, bf16=coords_bf16_exact, bq=bq, bt=bt, gj=gj
    )
    smem11 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, kq), jnp.float32),
        grid=(gi,),
        in_specs=[
            smem11, smem11,
            pl.BlockSpec(
                (1, 1, gj), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, gj), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((3, bq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (gj, 3, bt), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(scal(q_lo), scal(q_hi), order, dsort, query, t3)
    return out.reshape(kq)


_PRUNED_BATCHABLE_CACHE: dict = {}


def nearest_sq_pruned_pallas_batchable(
    query: jax.Array,
    target: jax.Array,
    q_lo: jax.Array,
    q_hi: jax.Array,
    n_target: jax.Array,
    coords_bf16_exact: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """vmap-safe wrapper for :func:`nearest_sq_pruned_pallas` (sequential
    map — the default batching rule would prepend the batch to the grid)."""
    from convexadam_tpu.ops.warp_pallas import make_sequential_vmap

    key = (coords_bf16_exact, interpret)
    if key not in _PRUNED_BATCHABLE_CACHE:
        _PRUNED_BATCHABLE_CACHE[key] = make_sequential_vmap(
            lambda q, t, lo, hi, nt: nearest_sq_pruned_pallas(
                q, t, lo, hi, nt,
                coords_bf16_exact=coords_bf16_exact, interpret=interpret,
            )
        )
    return _PRUNED_BATCHABLE_CACHE[key](
        query, target,
        jnp.asarray(q_lo, jnp.int32), jnp.asarray(q_hi, jnp.int32),
        jnp.asarray(n_target, jnp.int32),
    )


_DUAL_BATCHABLE_CACHE: dict = {}


def nearest_sq_dual_pallas_batchable(
    query: jax.Array,
    target: jax.Array,
    n_query: "jax.Array | None" = None,
    n_target: "jax.Array | None" = None,
    head_query: "jax.Array | None" = None,
    head_target: "jax.Array | None" = None,
    coords_bf16_exact: bool = False,
    interpret: bool = False,
) -> tuple:
    """vmap-safe wrapper for :func:`nearest_sq_dual_pallas` (sequential map,
    same rationale as :func:`nearest_sq_pallas_batchable`)."""
    from convexadam_tpu.ops.warp_pallas import make_sequential_vmap

    key = (coords_bf16_exact, interpret)
    if key not in _DUAL_BATCHABLE_CACHE:
        _DUAL_BATCHABLE_CACHE[key] = make_sequential_vmap(
            lambda q, t, nq, nt, hq, ht: nearest_sq_dual_pallas(
                q, t, nq, nt, hq, ht,
                coords_bf16_exact=coords_bf16_exact, interpret=interpret,
            )
        )
    kq = query.shape[1]
    kt = target.shape[1]
    nq = jnp.int32(kq) if n_query is None else n_query
    nt = jnp.int32(kt) if n_target is None else n_target
    hq = jnp.int32(0) if head_query is None else head_query
    ht = jnp.int32(0) if head_target is None else head_target
    return _DUAL_BATCHABLE_CACHE[key](query, target, nq, nt, hq, ht)


_BATCHABLE_CACHE: dict = {}


def nearest_sq_pallas_batchable(
    query: jax.Array,
    target: jax.Array,
    n_query: "jax.Array | None" = None,
    n_target: "jax.Array | None" = None,
    coords_bf16_exact: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """vmap-safe wrapper: the default ``pallas_call`` batching rule prepends
    the batch to the grid, re-keying ``pl.program_id(1)`` (the accumulation
    axis) — map sequentially instead (total search cells are identical)."""
    from convexadam_tpu.ops.warp_pallas import make_sequential_vmap

    key = (coords_bf16_exact, interpret)
    if key not in _BATCHABLE_CACHE:
        _BATCHABLE_CACHE[key] = make_sequential_vmap(
            lambda q, t, nq, nt: nearest_sq_pallas(
                q, t, nq, nt, coords_bf16_exact=coords_bf16_exact,
                interpret=interpret,
            )
        )
    kq = query.shape[1]
    kt = target.shape[1]
    nq = jnp.int32(kq) if n_query is None else n_query
    nt = jnp.int32(kt) if n_target is None else n_target
    return _BATCHABLE_CACHE[key](query, target, nq, nt)
