"""The vmapped/sharded sweep engine.

Reference workloads (SURVEY.md §3.4): stage-1 sweeps 100 convex settings x N
case pairs (convex_run_withconfig.py), stage-2 sweeps 75 Adam settings x N
pairs x 16 evaluation variants (adam_run_withconfig_shiftSpline.py), each as
a sequential process-per-GPU Python loop.  Here every setting batch runs one
jitted function **vmapped over (settings x case pairs)**; one compilation is
reused across all settings that share tensor shapes (same grid_sp/disp_hw —
the remaining hyperparameter is a traced scalar), and with a
``parallel.batch.make_sweep_mesh()`` mesh the settings axis shards over the
``setting`` mesh axis and the pair axis over the ``pair`` axis — the whole
search becomes one SPMD program spanning the slice instead of N processes.

HD95 runs on-device by default on TPU (surface-point-set nearest-neighbour
matmuls, core/edt.py) sharded over the same mesh; ``hd95_mode="host"``
keeps the reference-style cupy/scipy host round-trip.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional, Sequence  # noqa: F401 (Sequence used in annotations)

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from convexadam_tpu.core.adam import adam_instance_optimisation
from convexadam_tpu.core.convex import convex_displacement
from convexadam_tpu.core.features import (
    label_counts,
    mindssc,
    semantic_features,
)
from convexadam_tpu.core.metrics import (
    dice_coeff,
    hd95,
    jacobian_determinant,
    rank_product,
    sort_rank,
)
from convexadam_tpu.core.smoothing import avg_pool3d, box_smooth_repeated
from convexadam_tpu.core.warp import (
    inverse_consistency,
    resize_trilinear,
    warp_with_displacement,
)
from convexadam_tpu.parallel.distributed import is_multiprocess
from convexadam_tpu.parallel.distributed import make_global as _mg
from convexadam_tpu.selfconfig.checkpoint import SweepCheckpointer
from convexadam_tpu.selfconfig.settings import (
    STAGE2_SNAPSHOT_ITERS,
    Stage1Setting,
    Stage2Setting,
)


# ---------------------------------------------------------------------------
# jitted per-pair computations
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("num_labels", "grid_sp", "disp_hw", "coarse")
)
def convex_field_semantic(
    pred_fixed: jax.Array,
    pred_moving: jax.Array,
    nn_mult: jax.Array,
    num_labels: int,
    grid_sp: int,
    disp_hw: int,
    coarse: bool = False,
) -> jax.Array:
    """Convex stage on semantic features with inverse consistency
    (convex_run_withconfig.py:101-131).  Returns the displacement field in
    fine-voxel units — full resolution, or coarse-grid (``coarse=True``, the
    stage-2 cache, adam_run_withconfig_shiftSpline.py:126)."""
    H, W, D = pred_fixed.shape
    ff, fm = semantic_features(
        pred_fixed, pred_moving, num_labels=num_labels, mult=1.0
    )
    # nn_mult is a traced scalar so one compile serves all settings with the
    # same (grid_sp, disp_hw); features scale linearly in `mult`
    ff = ff * nn_mult
    fm = fm * nn_mult
    fix_s = avg_pool3d(ff, grid_sp, stride=grid_sp)
    mov_s = avg_pool3d(fm, grid_sp, stride=grid_sp)

    disp_soft = convex_displacement(fix_s, mov_s, disp_hw)
    disp_soft_r = convex_displacement(mov_s, fix_s, disp_hw)

    h, w, d = disp_soft.shape[1:]
    scale = jnp.array(
        [(h - 1) / 2.0, (w - 1) / 2.0, (d - 1) / 2.0], jnp.float32
    ).reshape(3, 1, 1, 1)
    disp_ice, _ = inverse_consistency(disp_soft / scale, disp_soft_r / scale, 15)
    disp_lr = disp_ice * scale * grid_sp
    if coarse:
        return disp_lr
    return resize_trilinear(disp_lr, (H, W, D), align_corners=False)


@functools.partial(
    jax.jit, static_argnames=("mind_r", "mind_d", "grid_sp", "disp_hw")
)
def convex_field_mind(
    img_fixed: jax.Array,
    img_moving: jax.Array,
    mind_r: int,
    mind_d: int,
    grid_sp: int,
    disp_hw: int,
) -> jax.Array:
    """Convex stage on MIND features (convex_run_paired_mind.py:101-165)."""
    H, W, D = img_fixed.shape
    ff = mindssc(img_fixed, mind_r, mind_d)
    fm = mindssc(img_moving, mind_r, mind_d)
    fix_s = avg_pool3d(ff, grid_sp, stride=grid_sp)
    mov_s = avg_pool3d(fm, grid_sp, stride=grid_sp)
    disp_soft = convex_displacement(fix_s, mov_s, disp_hw)
    disp_soft_r = convex_displacement(mov_s, fix_s, disp_hw)
    h, w, d = disp_soft.shape[1:]
    scale = jnp.array(
        [(h - 1) / 2.0, (w - 1) / 2.0, (d - 1) / 2.0], jnp.float32
    ).reshape(3, 1, 1, 1)
    disp_ice, _ = inverse_consistency(disp_soft / scale, disp_soft_r / scale, 15)
    return resize_trilinear(disp_ice * scale * grid_sp, (H, W, D), align_corners=False)


@functools.partial(jax.jit, static_argnames=("num_labels",))
def evaluate_field_semantic(
    disp_hr: jax.Array,
    seg_fixed: jax.Array,
    seg_moving: jax.Array,
    num_labels: int,
):
    """Warp the moving segmentation (nearest) and compute Dice / SDlogJ /
    negative-Jacobian fraction (convex_run_withconfig.py:138-152).
    Returns (dice (L,), jstd, neg_frac, seg_warped int16) — int16 because
    a stage-2 batch stacks (P, 4, 4) warped L2R-scale volumes for the HD95
    engine: f32 cost 4 GB of the 15.75 GB chip (observed OOM, round 5);
    labels are <= int16 by the sweep contract."""
    seg_warped = warp_with_displacement(
        seg_moving[None].astype(jnp.float32), disp_hr, mode="nearest"
    )[0]
    dice = dice_coeff(seg_fixed, seg_warped, num_labels + 1)
    det = jacobian_determinant(disp_hr)
    logd = jnp.log(jnp.clip(det + 3.0, 0.000000001, 1000000000.0))
    seg_w16 = jnp.round(seg_warped).astype(jnp.int16)
    return dice, jnp.std(logd), jnp.mean((det < 0).astype(jnp.float32)), seg_w16


# ---------------------------------------------------------------------------
# on-device HD95 over a sweep batch
# ---------------------------------------------------------------------------

def _suggest_label_groups(
    segs_np: np.ndarray, num_labels: int
) -> tuple[list, int]:
    """Bucket labels by surface size for hd95_device: returns
    ([(labels_tuple, K)], global_cap).  Each label's point-set buffer K is
    1.5x its largest ground-truth surface NEED — max(inner surface, outer
    shell) per core/edt.py:surface_stats, since label_buffers fills both
    buffers to the same cap and a thin structure's outer shell exceeds its
    inner surface — rounded up to a multiple of 4096 (warped predictions
    have comparable surface area to GT).  Small organs thus pay small
    K x K nearest-neighbour searches instead of the largest label's (the
    search is quadratic in the buffer; with the kernels' all-pad block
    skipping the buckets mainly bound buffer memory, sort length and
    compile variety)."""
    from convexadam_tpu.core.edt import surface_stats

    per_label = np.ones(num_labels)
    total_worst = 1
    for seg in segs_np:
        need, total = surface_stats(seg, num_labels)
        total_worst = max(total_worst, total)
        per_label = np.maximum(per_label, need[1: num_labels + 1])
    n = int(np.prod(segs_np.shape[1:]))
    buckets: dict = {}
    for lab in range(1, num_labels + 1):
        # multiple-of-4096 rounding, NOT power-of-two: the K x K search is
        # quadratic in the buffer, so pow2's average 1.41x rounding slack
        # costs ~2x extra search cells (the dominant sweep term).  The
        # 4096 floor keeps headroom for warped surfaces that outgrow the
        # GT-derived bound (the 1.5x slack is measured from GT only).
        k = 4096 * int(np.ceil(1.5 * per_label[lab - 1] / 4096))
        k = int(min(max(k, 4096), min(262144, n)))
        buckets.setdefault(k, []).append(lab)
    # multiple-of-4096 like the per-label caps, NOT pow2: everything in
    # label_buffers (cumsum ranks, packed scatters) is linear in the global
    # list length, and pow2's average 1.41x slack was pure waste (measured
    # round 4: Kg 1048576 -> 536576 on the bench fixture)
    kg = 4096 * int(np.ceil(max(1.5 * total_worst, 4096) / 4096))
    groups = [(tuple(labs), k) for k, labs in sorted(buckets.items())]
    return groups, int(min(kg, n))


_HD95_FN_CACHE: dict = {}


def _make_hd95_batch_fn(
    mesh: Optional[Mesh],
    num_labels: int,
    label_chunk: int = 4,
    max_surface: Optional[int] = None,
    global_surface: Optional[int] = None,
    label_groups=None,
):
    """Batched on-device HD95: (P, H, W, D) GT segs + (G, P, *V, H, W, D)
    warped segs → ((G, P, *V) per-case label-mean HD95,
    (G, P, *V) bool cap-overflow flags — True where a surface outgrew its
    GT-sized buffer and the value may be biased; callers re-score those
    cases exactly (core/edt.py:caps_overflow)).

    Replaces the reference's host loop of cupy/scipy EDTs
    (convexAdam_hyper_util.py:32-51, convex_run_withconfig.py:143): each
    device runs the surface point-set HD95 (core/edt.py) sequentially over its
    LOCAL (setting, pair) shard via ``shard_map`` — the metric stays inside
    the SPMD program instead of serializing the mesh behind one host.
    """
    # memoised: a fresh closure per sweep call would re-trace (and
    # re-load from the compile cache) the whole HD95 program every sweep.
    # Keyed on the Mesh itself (hashable; equal meshes share the entry —
    # id() would miss rebuilt-but-identical meshes AND pin dead ones) and
    # bounded so a long-lived process sweeping many mesh/label-group
    # combinations doesn't accumulate compiled programs forever.
    key = (
        mesh, num_labels, label_chunk, max_surface, global_surface,
        tuple(label_groups) if label_groups is not None else None,
    )
    if key in _HD95_FN_CACHE:
        return _HD95_FN_CACHE[key]
    while len(_HD95_FN_CACHE) >= 16:  # FIFO eviction (dict is ordered)
        _HD95_FN_CACHE.pop(next(iter(_HD95_FN_CACHE)))

    from convexadam_tpu.core.edt import (
        LabelBuffers,
        SurfaceLists,
        caps_overflow,
        hd95_from_buffers,
        inside_flags,
        label_buffers_inner,
        label_buffers_outer,
        surface_side,
    )

    def _groups_caps(shape3):
        n_vox = int(np.prod(shape3))
        groups = (
            label_groups
            if label_groups is not None
            else [(
                tuple(range(1, num_labels + 1)),
                min(n_vox, 65536) if max_surface is None else max_surface,
            )]
        )
        caps = [0] * (num_labels + 1)
        for labs_g, k_g in groups:
            for lab in labs_g:
                caps[lab] = k_g
        return groups, tuple(caps), max(shape3) <= 256

    # the FIXED side's preamble and outer shell depend on the fixed volume
    # only — computed ONCE per pair and shared across every setting and
    # evaluation variant (stage-2 scores 16 variants per setting; the
    # per-variant leftovers are one fenced Kg gather for the agreement
    # bits + the fixed INNER partition, whose [inside|outside]
    # segmentation needs them).  Callers amortize further by passing
    # ``fn.prep(sf)``'s result back via ``sides=`` — one prep per SWEEP
    # instead of one per setting batch.
    def prep_local(sf):
        _, caps, _ = _groups_caps(sf.shape[-3:])

        def fixed_side(sf_i):
            side = surface_side(sf_i, num_labels, global_surface)
            outer, n_outer = label_buffers_outer(
                side.own, side.nbv, side.gc, num_labels, caps
            )
            return side, outer, n_outer

        return jax.lax.map(fixed_side, sf)

    def local_fn(sf, sw, sides_f):
        v_shape = sw.shape[2:-3]
        swf = sw.reshape(sw.shape[:2] + (-1,) + sw.shape[-3:])
        groups, caps, bf16ok = _groups_caps(sf.shape[-3:])

        def per_v(sw_v, sf_i, side_f, outer_f, n_outer_f):
            seg_w = jnp.round(sw_v).astype(jnp.int32)
            side_m = surface_side(
                seg_w, num_labels, global_surface, seg_other=sf_i
            )
            in_f = inside_flags(side_f, sf_i, seg_w)
            inner_f, n_inner_f, n_inside_f = label_buffers_inner(
                side_f.own, side_f.gc, in_f, num_labels, caps
            )
            inner_m, n_inner_m, n_inside_m = label_buffers_inner(
                side_m.own, side_m.gc, side_m.inside, num_labels, caps
            )
            outer_m, n_outer_m = label_buffers_outer(
                side_m.own, side_m.nbv, side_m.gc, num_labels, caps
            )
            bufs = LabelBuffers(
                inner_f, outer_f, inner_m, outer_m,
                n_inner_f, n_inner_m, n_inside_f, n_inside_m,
                n_outer_f, n_outer_m, side_f.counts, side_m.counts,
            )
            pre = SurfaceLists(
                side_f.own, side_f.nbv, side_f.gc, in_f,
                side_m.own, side_m.nbv, side_m.gc, side_m.inside,
                side_f.counts, side_m.counts,
                side_f.n_total, side_m.n_total,
            )
            parts = [
                hd95_from_buffers(
                    bufs, caps, k, label_chunk=label_chunk, labels=labs,
                    coords_bf16_exact=bf16ok,
                )
                for labs, k in groups
            ]
            return jnp.mean(jnp.concatenate(parts)), caps_overflow(
                pre, bufs, caps
            )

        def per_p(args):
            sf_i, (side_f, outer_f, n_outer_f), sw_i = args
            return jax.lax.map(
                lambda s: per_v(s, sf_i, side_f, outer_f, n_outer_f), sw_i
            )

        def per_g(sw_g):
            return jax.lax.map(per_p, (sf, sides_f, sw_g))

        out, over = jax.lax.map(per_g, swf)  # (G_loc, P_loc, V')
        return (
            out.reshape(sw.shape[:2] + v_shape),
            over.reshape(sw.shape[:2] + v_shape),
        )

    def local_inline(sf, sw):
        return local_fn(sf, sw, prep_local(sf))

    if mesh is None:
        score2 = jax.jit(local_inline)
        score3 = jax.jit(local_fn)
        prep = jax.jit(prep_local)
    else:
        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # older jax
            from jax.experimental.shard_map import shard_map

        names = mesh.axis_names
        set_ax = "setting" if "setting" in names else None
        pair_ax = "pair" if "pair" in names else None
        p_pair = PartitionSpec(pair_ax)
        p_gp = PartitionSpec(set_ax, pair_ax)
        body_out = (p_gp, p_gp)

        def _shmap(f, in_specs, out_specs):
            try:
                # check_vma=False: the body is purely local (no
                # collectives); the varying-manual-axes type check rejects
                # data-independent scan carries inside otherwise
                return shard_map(
                    f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_vma=False,
                )
            except TypeError:  # older JAX spells it check_rep
                return shard_map(
                    f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False,
                )

        out_spec = (
            PartitionSpec() if jax.process_count() > 1
            else p_gp
        )
        sh = NamedSharding(mesh, out_spec)
        # sides ride sharded along the pair axis like sf (p_pair is a
        # pytree-prefix spec applied to every leaf of the sides pytree)
        score2 = jax.jit(
            _shmap(local_inline, (p_pair, p_gp), body_out),
            out_shardings=(sh, sh),
        )
        score3 = jax.jit(
            _shmap(local_fn, (p_pair, p_gp, p_pair), body_out),
            out_shardings=(sh, sh),
        )
        prep = jax.jit(_shmap(prep_local, (p_pair,), p_pair))

    def fn(sf, sw, sides=None):
        if sides is None:
            return score2(sf, sw)
        return score3(sf, sw, sides)

    fn.prep = prep
    _HD95_FN_CACHE[key] = fn
    return fn


def _exact_hd95_rescore(
    seg_fixed_np: np.ndarray, seg_warped_dev, num_labels: int
) -> float:
    """Exact per-case label-mean HD95 for a cap-overflow case: fetch the one
    warped seg to host and rescore with exactly-measured buffers
    (core/edt.py:hd95_device_sized on TPU, the host EDT loop elsewhere).
    Rare path — only cases whose warped surface outgrew the GT-sized sweep
    buffers (caps_overflow) pay the volume download."""
    sw = np.asarray(seg_warped_dev).round().astype(np.int32)
    if jax.default_backend() == "tpu":
        from convexadam_tpu.core.edt import hd95_device_sized  # noqa: PLC0415

        return float(
            np.asarray(hd95_device_sized(seg_fixed_np, sw, num_labels)).mean()
        )
    return float(np.asarray(hd95(seg_fixed_np, sw, num_labels)).mean())


def _rescore_overflows(
    hd_batch: np.ndarray,
    overflow: np.ndarray,
    seg_warped_dev,
    segs_np: np.ndarray,
    fi: np.ndarray,
    num_labels: int,
) -> tuple[int, float]:
    """Re-score every flagged (setting, pair[, variant]) entry of
    ``hd_batch`` in place (pair is axis 1, indexing ``fi``).  Under a
    multi-process runtime the warped segs are not host-addressable — warn
    and keep the (possibly truncated) device values.

    Returns ``(n_rescored, seconds)`` so sweeps can surface the fallback's
    cost in their result object (it runs OUTSIDE the timed window — the
    per-setting times and the bench headline exclude the ~17 MB/s volume
    downloads — making overflow runs auditable, not invisible)."""
    import warnings  # noqa: PLC0415

    idxs = np.argwhere(overflow)
    if idxs.size == 0:
        return 0, 0.0
    if is_multiprocess():
        warnings.warn(
            f"HD95 cap overflow on {len(idxs)} sweep case(s); exact rescore "
            "is unavailable under a multi-process runtime — values may be "
            "biased (raise the sweep caps)",
            RuntimeWarning,
            stacklevel=3,
        )
        return 0, 0.0
    warnings.warn(
        f"HD95 cap overflow on {len(idxs)} sweep case(s) — warped surfaces "
        "outgrew the GT-sized buffers; re-scoring those cases exactly",
        RuntimeWarning,
        stacklevel=3,
    )
    t0 = time.time()
    for idx in idxs:
        t = tuple(int(v) for v in idx)
        hd_batch[t] = _exact_hd95_rescore(
            segs_np[fi[t[1]]], seg_warped_dev[t], num_labels
        )
    return len(idxs), time.time() - t0


# ---------------------------------------------------------------------------
# mesh fan-out helpers
# ---------------------------------------------------------------------------

def _resolve_hd95_mode(hd95_mode, shape, backend: str) -> str:
    """Default HD95 evaluation mode: the on-device surface engine on TPU,
    the scipy/C++ EDT host loop elsewhere — and host whenever an axis
    extent exceeds the device engine's packed-int32 coordinate limit
    (edt.MAX_PACKED_EXTENT/axis, core/edt.py:surface_lists).  An EXPLICIT
    "device" request is honoured as-is (surface_lists raises loudly past
    the limit)."""
    from convexadam_tpu.core.edt import MAX_PACKED_EXTENT  # noqa: PLC0415

    if hd95_mode is not None:
        return hd95_mode
    if backend == "tpu" and max(shape) <= MAX_PACKED_EXTENT:
        return "device"
    return "host"


def _mesh_factors(mesh: Optional[Mesh]) -> tuple[int, int]:
    """(n_setting_shards, n_pair_shards) of a sweep mesh; (1, 1) if None."""
    if mesh is None:
        return 1, 1
    ax = dict(zip(mesh.axis_names, mesh.devices.shape))
    return ax.get("setting", 1), ax.get("pair", 1)


def _sweep_specs(mesh: Optional[Mesh]):
    """(pair-sharded, setting-sharded, replicated, (setting,pair)-out)
    NamedShardings for a sweep mesh (None mesh → all None).

    Under a multi-process (DCN) runtime the outputs come back fully
    replicated instead — XLA all-gathers the small metric tensors across
    hosts so every process can read them with plain np.asarray
    (parallel/distributed.py)."""
    if mesh is None:
        return None, None, None, None
    names = mesh.axis_names
    set_ax = "setting" if "setting" in names else None
    pair_ax = "pair" if "pair" in names else None
    out_spec = (
        PartitionSpec()
        if jax.process_count() > 1
        else PartitionSpec(set_ax, pair_ax)
    )
    return (
        NamedSharding(mesh, PartitionSpec(pair_ax)),
        NamedSharding(mesh, PartitionSpec(set_ax)),
        NamedSharding(mesh, PartitionSpec()),
        NamedSharding(mesh, out_spec),
    )


def _dev(arr: np.ndarray, sharding) -> jax.Array:
    """Commit a host array to the device(s) ONCE, outside the sweep's
    setting-chunk loop.  ``make_global`` alone leaves single-process inputs
    as numpy, so every chunk's jit call re-uploaded the full volumes — on a
    tunneled TPU that transfer (~40 MB/volume at ~30 MB/s) dominated the
    sweep wall-clock ~5x over the actual device work (measured round 3)."""
    if is_multiprocess():
        return _mg(arr, sharding)
    if sharding is None:
        return jax.device_put(arr)
    return jax.device_put(arr, sharding)


def _pad_axis0(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad axis 0 up to length ``n`` by repeating the last entry (padded
    results are computed redundantly and discarded on the host)."""
    if len(arr) >= n:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], n - len(arr), axis=0)])


def _chunked_setting_groups(settings, key_fn, chunk: int):
    """Group setting indices by their static-shape key (one XLA compilation
    per key), then split each group into ``chunk``-sized slices that run as
    one vmapped-settings batch."""
    groups: dict = {}
    for idx, st in enumerate(settings):
        groups.setdefault(key_fn(st), []).append(idx)
    out = []
    for key, idxs in groups.items():
        for i in range(0, len(idxs), chunk):
            out.append((key, idxs[i: i + chunk]))
    return out


def _compile_ahead(make_fn, chunks, completed, example_args):
    """Compile-ahead scheduler: AOT-lower + compile each distinct shape
    class in worker threads so remote XLA compiles overlap device execution
    of earlier classes.

    The reference pays no compile cost (eager torch); under jit every
    (grid_sp, disp_hw) class is a separate XLA program and the remote TPU
    compile service takes 30 s – minutes per program, which would serialize
    against the sweep (the 100-setting protocol has 22 stage-1 + 20 stage-2
    classes).  Compiles are chipless (AOT) so they are pure host/tunnel
    work, safe to overlap with chip execution; the first class still
    blocks.  Returns ``{key: Future[jax.stages.Compiled]}`` (the main loop
    calls ``fut.result()``, so compile errors surface exactly where the
    inline compile would raise) or None when disabled.

    ``example_args`` may be a callable ``key -> args tuple`` when classes
    compile for different input shapes (stage 2 chunks the pair axis of
    its heaviest classes — see ``run_stage2_sweep``'s ``pair_chunk``).

    ``CONVEXADAM_COMPILE_WORKERS``: 0 disables (inline compiles), 1
    (default) pipelines compiles behind execution, >1 additionally issues
    that many remote compiles concurrently.
    """
    import os  # noqa: PLC0415
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    workers = int(os.environ.get("CONVEXADAM_COMPILE_WORKERS", "1"))
    keys: list = []
    for key, idxs in chunks:
        if completed.issuperset(idxs) or key in keys:
            continue
        keys.append(key)
    if workers <= 0 or len(keys) <= 1:
        return None
    ex = ThreadPoolExecutor(max_workers=workers)
    ea = example_args if callable(example_args) else (lambda _k: example_args)
    futs = {
        key: ex.submit(
            lambda k=key: make_fn(*k).lower(*ea(k)).compile()
        )
        for key in keys
    }
    ex.shutdown(wait=False)  # threads finish on their own
    return futs


# ---------------------------------------------------------------------------
# stage 1
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SweepResult:
    dice: np.ndarray  # (S, 2) mean / robust30
    jstd: np.ndarray  # (S, 2) SDlogJ / negative fraction
    hd95: np.ndarray  # (S,)
    times: np.ndarray  # (S,) seconds per setting (all pairs)
    rank: np.ndarray  # (S,) or (S*V,) aggregated rank
    best: int
    # HD95 cap-overflow audit: cases re-scored exactly on host (outside the
    # timed window — `times` excludes this) and the seconds they took.  A
    # clean sweep has (0, 0.0); nonzero means the GT-sized buffers were
    # outgrown and the fallback's volume downloads happened.
    rescored: int = 0
    rescore_sec: float = 0.0


def _robust30_label_sets(
    segs: np.ndarray, pairs: Sequence[tuple[int, int]], num_labels: int
) -> list[np.ndarray]:
    """Per-pair sets of the 30% worst-Dice labels before registration
    (convex_run_withconfig.py:59-62; the reference's ``config['num_labels']``
    is our ``num_labels + 1``)."""
    out = []
    k = max(1, int((num_labels + 1) * 0.3))
    for (i, j) in pairs:
        d = np.asarray(dice_coeff(jnp.asarray(segs[i]), jnp.asarray(segs[j]), num_labels + 1))
        out.append(np.argsort(d)[:k])
    return out


def run_stage1_sweep(
    preds: np.ndarray,
    segs: np.ndarray,
    pairs: Sequence[tuple[int, int]],
    settings: Sequence[Stage1Setting],
    num_labels: int,
    compute_hd95: bool = True,
    verbose: bool = False,
    checkpoint_path=None,
    mesh: Optional[Mesh] = None,
    setting_batch: Optional[int] = None,
    resume: bool = False,
    hd95_mode: "str | None" = None,
) -> SweepResult:
    """Stage-1 semantic sweep (convex_run_withconfig.py:78-172).

    ``hd95_mode``: "device" evaluates HD95 with the on-device surface
    point-set search sharded over the mesh (see :func:`_make_hd95_batch_fn`); "host"
    keeps the reference-style scipy/C++ EDT host loop; None (default)
    picks "device" on TPU and "host" on CPU (the single-threaded host
    of this repo's CI runs scipy faster than XLA:CPU runs the flood).

    With ``checkpoint_path`` the partial metric arrays are saved after every
    setting batch (the reference's torch.save checkpointing,
    convex_run_withconfig.py:156 — a crashed sweep loses at most one batch).

    With ``mesh`` (a (setting, pair) mesh from
    ``parallel.batch.make_sweep_mesh``) the sweep fans out across devices:
    settings sharing an XLA shape key (grid_sp, disp_hw) are batched
    ``setting_batch`` at a time over the ``setting`` mesh axis (nn_mult is a
    traced scalar, so one compilation serves the whole batch) and case pairs
    shard over the ``pair`` axis — the TPU-native replacement for the
    reference's process-per-GPU fan-out (convex_run_withconfig.py:42-43).
    Both axes are padded to shard evenly; padded work is discarded on host.

    ``preds``/``segs``: (K, H, W, D) integer label volumes (predictions and
    ground truth); ``pairs``: (fixed_idx, moving_idx) tuples; metrics are
    rank-aggregated over {dice, robust30 dice, HD95, SDlogJ}.
    """
    pairs = list(pairs)
    P = len(pairs)
    robust30 = _robust30_label_sets(segs, pairs, num_labels)
    preds_np = np.asarray(preds, np.int32)
    segs_np = np.asarray(segs, np.int32)

    n_set_shards, n_pair_shards = _mesh_factors(mesh)
    if setting_batch is None:
        setting_batch = max(1, n_set_shards)
    pair_sh, set_sh, _, out_sh = _sweep_specs(mesh)

    fi = np.array([p[0] for p in pairs])
    mi = np.array([p[1] for p in pairs])
    P_pad = -(-P // n_pair_shards) * n_pair_shards
    fi_p = _pad_axis0(fi, P_pad)
    mi_p = _pad_axis0(mi, P_pad)

    S = len(settings)
    dice = np.zeros((S, 2))
    jstd = np.zeros((S, 2))
    hd = np.zeros(S)
    times = np.zeros(S)

    ck = SweepCheckpointer(checkpoint_path) if checkpoint_path is not None else None
    completed: set = set()
    if ck is not None and resume:
        st = ck.restore()
        if st is not None and "completed" in st and st["dice"].shape == dice.shape:
            dice[:], jstd[:], hd[:], times[:] = (
                st["dice"], st["jstd"], st["hd95"], st["times"]
            )
            completed = {int(i) for i in st["completed"]}
    rescored, rescore_sec = 0, 0.0  # cap-overflow audit (this run only)

    def make_fn(grid_sp: int, disp_hw: int):
        def pair_fn(pf, pm, sf, sm, nn_mult):
            disp_hr = convex_field_semantic(
                pf, pm, nn_mult, num_labels=num_labels + 1,
                grid_sp=grid_sp, disp_hw=disp_hw,
            )
            d, js, nf, sw = evaluate_field_semantic(disp_hr, sf, sm, num_labels)
            if compute_hd95:
                return d, js, nf, sw
            return d, js, nf  # unused warped seg is DCE'd — saves HBM
        if mesh is None:
            # SEQUENTIAL over pairs on one device (same rationale as the
            # stage-2 pass B): the pair vmap multiplies the K^3 cost-volume
            # temps by P — the (grid_sp=4, disp_hw=4) class alone held two
            # (729, 8, 48, 40, 64) f32 temps = 10.7 GB padded and OOM'd the
            # 15.75 GB chip (observed on the 100-setting protocol, round 5)
            f1 = lambda pf, pm, sf, sm, mult: jax.lax.map(  # noqa: E731
                lambda a: pair_fn(*a, mult), (pf, pm, sf, sm)
            )
            f = jax.vmap(f1, in_axes=(None, None, None, None, 0))  # settings
            return jax.jit(f)
        f = jax.vmap(pair_fn, in_axes=(0, 0, 0, 0, None))       # pairs
        f = jax.vmap(f, in_axes=(None, None, None, None, 0))    # settings
        n_out = 4 if compute_hd95 else 3
        return jax.jit(
            f,
            in_shardings=(pair_sh, pair_sh, pair_sh, pair_sh, set_sh),
            out_shardings=(out_sh,) * n_out,
        )

    compiled = {}  # (grid_sp, disp_hw) → compiled fn
    hd95_mode = _resolve_hd95_mode(
        hd95_mode, segs_np.shape[1:], jax.default_backend()
    )
    hd95_fn = None
    if compute_hd95 and hd95_mode == "device":
        label_groups, k_global = _suggest_label_groups(segs_np, num_labels)
        hd95_fn = _make_hd95_batch_fn(
            mesh, num_labels,
            label_groups=label_groups, global_surface=k_global,
        )
    # volumes go to the device(s) ONCE; only the tiny setting scalars move
    # per chunk (see _dev — per-chunk re-upload dominated the sweep)
    pf_d = _dev(preds_np[fi_p], pair_sh)
    pm_d = _dev(preds_np[mi_p], pair_sh)
    sf_d = _dev(segs_np[fi_p], pair_sh)
    sm_d = _dev(segs_np[mi_p], pair_sh)
    gt_sharded = sf_d if hd95_fn is not None else None
    # fixed-side preamble once per SWEEP (shared by every setting batch)
    hd95_sides = hd95_fn.prep(gt_sharded) if hd95_fn is not None else None
    chunks = _chunked_setting_groups(
        settings, lambda st: (st.grid_sp, st.disp_hw), setting_batch
    )
    futs = _compile_ahead(
        make_fn, chunks, completed,
        (pf_d, pm_d, sf_d, sm_d,
         _mg(np.zeros(setting_batch, np.float32), set_sh)),
    )
    for key, idxs in chunks:
        if completed.issuperset(idxs):
            continue  # resume: this batch is already in the checkpoint
        if key not in compiled:
            compiled[key] = (
                futs[key].result() if futs is not None else make_fn(*key)
            )
        mults = _pad_axis0(
            np.array([settings[i].nn_mult for i in idxs], np.float32),
            setting_batch,
        )
        t0 = time.time()
        out = compiled[key](
            pf_d, pm_d, sf_d, sm_d, _mg(mults, set_sh),
        )
        hd_batch = sw = ov = seg_warped = None
        if compute_hd95:
            d, js, nf, seg_warped = out
            if hd95_fn is not None:
                # warped segs never leave the device — HD95 is computed in
                # a second sharded program over the same (setting, pair)
                # layout, then only the (G, P) scalars come back.  Padded
                # setting rows (axis 0) are dropped here so the rare exact
                # rescore below never re-downloads duplicate rows.
                hd_dev, ov_dev = hd95_fn(gt_sharded, seg_warped, hd95_sides)
                hd_batch = np.asarray(hd_dev)[: len(idxs), :P].copy()
                ov = np.asarray(ov_dev)[: len(idxs), :P]
            else:
                sw = np.asarray(seg_warped)[:, :P]
        else:
            d, js, nf = out
        d = np.asarray(d)[:, :P]  # (G, P, L), padding dropped
        js = np.asarray(js)[:, :P]
        nf = np.asarray(nf)[:, :P]
        dt = (time.time() - t0) / len(idxs)
        if ov is not None:
            # outside the timed window: the overflow fallback's volume
            # downloads must not inflate times[s] (the bench headline)
            n_r, t_r = _rescore_overflows(
                hd_batch, ov, seg_warped, segs_np, fi, num_labels
            )
            rescored += n_r
            rescore_sec += t_r
        for g, s in enumerate(idxs):
            st = settings[s]
            dice[s, 0] = d[g].mean()
            dice[s, 1] = np.mean([d[g, i, robust30[i]].mean() for i in range(P)])
            jstd[s, 0] = js[g].mean()
            jstd[s, 1] = nf[g].mean()
            if hd_batch is not None:
                hd[s] = hd_batch[g].mean()
            elif compute_hd95:
                hd[s] = np.mean(
                    [
                        hd95(segs_np[fi[i]], sw[g, i].round().astype(np.int32), num_labels).mean()
                        for i in range(P)
                    ]
                )
            times[s] = dt
            if verbose:
                print(
                    f"s={s} {st} dice={dice[s,0]:.4f}/{dice[s,1]:.4f} "
                    f"jstd={jstd[s,0]:.4f} hd95={hd[s]:.3f} t={times[s]:.2f}s"
                )
        completed.update(int(i) for i in idxs)
        # release this class's device buffers before the next class's
        # programs execute (see the stage-2 loop: holding the previous
        # warped-seg batch across the rebind runtime-OOM'd the protocol)
        out = d = js = nf = seg_warped = hd_dev = ov_dev = None  # noqa: F841
        if ck is not None:
            ck.save(dict(dice=dice, jstd=jstd, hd95=hd, times=times,
                         completed=np.array(sorted(completed), np.int64)))

    # sort_rank gives rank 1.0 to the SMALLEST value → negate
    # higher-is-better metrics (convex_run_withconfig.py:162-169).  HD95 only
    # participates when it was actually computed — ranking an all-zeros array
    # would assign argsort-order ranks and bias the winner toward low setting
    # indices (the reference always computes HD95 before ranking,
    # adam_run_withconfig_shiftSpline.py:253-279).
    ranks = [
        sort_rank(-dice[:, 0]),
        sort_rank(-dice[:, 1]),
        sort_rank(jstd[:, 0]),
    ]
    if compute_hd95:
        ranks.insert(2, sort_rank(hd))
    rank1 = rank_product(ranks)
    return SweepResult(
        dice, jstd, hd, times, rank1, int(rank1.argmax()),
        rescored, rescore_sec,
    )


# ---------------------------------------------------------------------------
# stage 2
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("grid_sp_adam", "avg_n", "num_labels", "feat_dtype"),
)
def _stage2_pair(
    pred_fixed,
    pred_moving,
    seg_fixed,
    seg_moving,
    disp_lr_coarse,
    nn_mult,
    lambda_weight,
    grid_sp_adam: int,
    avg_n: int,
    num_labels: int,
    feat_dtype: str = "auto",
):
    """One pair x one Adam setting → metrics over the 4x4 evaluation grid
    (adam_run_withconfig_shiftSpline.py:175-263).

    ``feat_dtype``: precision of the pooled Adam features — "auto"
    (bfloat16 on TPU, float32 elsewhere: the SAME production policy as
    ConvexAdamConfig.dtype), "float32", or "bfloat16".  On TPU this is
    also a capacity requirement, not just a speed choice: the
    grid_sp_adam=1 (full-resolution) classes hold the corner stack AND the
    per-iteration gathered-corner temp at 8C channels each — f32 put the
    eval program at 15.6 GiB of HLO temps (runtime ResourceExhausted on
    the 15.75 GiB chip, observed on the 75-setting protocol); bf16 halves
    them (13.9 -> 7.5 GiB Adam-loop temps, AOT-measured)."""
    H, W, D = pred_fixed.shape
    g2 = grid_sp_adam
    if feat_dtype == "auto":
        dt = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
    else:
        dt = jnp.bfloat16 if feat_dtype == "bfloat16" else jnp.float32
    ff, fm = semantic_features(
        pred_fixed, pred_moving, num_labels=num_labels + 1, mult=1.0,
        dtype=dt,
    )
    ff = ff * nn_mult.astype(dt)
    fm = fm * nn_mult.astype(dt)
    # data-term scale = per-pair count of jointly-present labels (the sweep's
    # `n_ch`, adam_run_withconfig_shiftSpline.py:195,229)
    counts = label_counts(pred_fixed, num_labels + 1) + label_counts(
        pred_moving, num_labels + 1
    )
    cost_scale = jnp.sum(counts > 0).astype(jnp.float32)
    patch_fix = avg_pool3d(ff, g2, stride=g2)
    patch_mov = avg_pool3d(fm, g2, stride=g2)

    disp_hr0 = resize_trilinear(disp_lr_coarse, (H, W, D), align_corners=False)
    disp_lr = resize_trilinear(
        disp_hr0, (H // g2, W // g2, D // g2), align_corners=False
    )

    _, snaps = adam_instance_optimisation(
        patch_fix,
        patch_mov,
        disp_lr / g2,
        lambda_weight,
        niter=120,
        snapshot_iters=STAGE2_SNAPSHOT_ITERS,
        smoother=("bank", avg_n),
        cost_scale=cost_scale,
    )

    def eval_variant(field_lr):
        disp_hr = resize_trilinear(field_lr * g2, (H, W, D), align_corners=False)
        out = []
        for kk in range(4):
            if kk > 0:
                disp_hr = box_smooth_repeated(disp_hr, 3, 1)
            d, js, nf, sw = evaluate_field_semantic(
                disp_hr, seg_fixed, seg_moving, num_labels
            )
            out.append((d, js, nf, sw))
        dice_v = jnp.stack([o[0] for o in out])  # (4, L)
        js_v = jnp.stack([o[1] for o in out])
        nf_v = jnp.stack([o[2] for o in out])
        sw_v = jnp.stack([o[3] for o in out])
        return dice_v, js_v, nf_v, sw_v

    # sequential over the 4 snapshot variants, NOT vmapped: at L2R scale
    # (192x160x256) the vmapped evaluation materialized the jacobian/warp
    # intermediates for ALL iteration variants at once — with the pair vmap
    # outside, a single (1,8,4,3,3,H,W,D) temp = 8.4 GB and a 26 GB program
    # on a 15.75 GB chip (observed OOM, round 5).  One chip core executes
    # programs serially anyway (ROADMAP round-4 overlap measurement), so
    # sequencing costs nothing and caps the live set at one variant.
    dice_g, js_g, nf_g, sw_g = jax.lax.map(eval_variant, snaps)
    return dice_g, js_g, nf_g, sw_g


def run_stage2_sweep(
    preds: np.ndarray,
    segs: np.ndarray,
    pairs: Sequence[tuple[int, int]],
    convex_setting: Stage1Setting,
    adam_settings: Sequence[Stage2Setting],
    num_labels: int,
    compute_hd95: bool = True,
    verbose: bool = False,
    checkpoint_path=None,
    mesh: Optional[Mesh] = None,
    setting_batch: Optional[int] = None,
    resume: bool = False,
    hd95_mode: "str | None" = None,
    feat_dtype: str = "auto",
    pair_chunk: Optional[int] = None,
) -> SweepResult:
    """Stage-2 semantic sweep: cache best-convex fields (pass A), then sweep
    Adam settings x 16 evaluation variants (pass B), rank over the flattened
    S x 16 grid (adam_run_withconfig_shiftSpline.py:43-307).

    ``feat_dtype``: Adam feature precision, "auto" (bf16 on TPU — the
    production policy AND a capacity requirement for the grid_sp_adam=1
    classes, see :func:`_stage2_pair`) / "float32" / "bfloat16".

    ``pair_chunk``: single-device pair-axis execution chunk.  The unmeshed
    engine runs pairs sequentially inside one XLA program (``lax.map``);
    at full resolution (grid_sp_adam=1, 192x160x256) that one program
    executes for ~10+ minutes and the axon TPU worker deterministically
    crashes part-way (observed round 5: 1- and 2-pair programs complete in
    ~75 s/pair, the 8-pair program kills the worker every run).  Chunking
    splits the pair axis into host-level calls of at most ``pair_chunk``
    pairs — equivalent results (pairs are independent; XLA's
    shape-dependent fusion choices differ at the ~1e-5 rounding level),
    bounded per-execution device time.  None (default): grid_sp_adam==1 classes
    run at chunk 2, everything else unchunked; override globally with the
    CONVEXADAM_STAGE2_PAIR_CHUNK env var.  Ignored when ``mesh`` shards
    the pair axis.

    Like :func:`run_stage1_sweep`, a (setting, pair) ``mesh`` fans the sweep
    out across devices: settings sharing the (grid_sp_adam, avg_n) shape key
    batch over the ``setting`` axis (lambda_weight is traced) and pairs shard
    over the ``pair`` axis.

    ``compute_hd95`` defaults True like stage 1: the reference's rank2
    always includes HD95 (adam_run_withconfig_shiftSpline.py:276); pass
    False only for speed, accepting a 3-metric rank.
    """
    pairs = list(pairs)
    P = len(pairs)
    robust30 = _robust30_label_sets(segs, pairs, num_labels)
    preds_np = np.asarray(preds, np.int32)
    segs_np = np.asarray(segs, np.int32)
    fi = np.array([p[0] for p in pairs])
    mi = np.array([p[1] for p in pairs])

    n_set_shards, n_pair_shards = _mesh_factors(mesh)
    if setting_batch is None:
        setting_batch = max(1, n_set_shards)
    pair_sh, set_sh, rep_sh, out_sh = _sweep_specs(mesh)

    P_pad = -(-P // n_pair_shards) * n_pair_shards
    fi_p = _pad_axis0(fi, P_pad)
    mi_p = _pad_axis0(mi, P_pad)

    # pass A: cached coarse convex fields (pair axis sharded when meshed)
    coarse_f = jax.vmap(
        lambda pf, pm, mult: convex_field_semantic(
            pf, pm, mult, num_labels=num_labels + 1,
            grid_sp=convex_setting.grid_sp, disp_hw=convex_setting.disp_hw,
            coarse=True,
        ),
        in_axes=(0, 0, None),
    )
    if mesh is None:
        coarse_fn = jax.jit(coarse_f)
    else:
        coarse_fn = jax.jit(
            coarse_f,
            in_shardings=(pair_sh, pair_sh, rep_sh),
            out_shardings=pair_sh,
        )
    # volumes go to the device(s) ONCE (see _dev)
    pf_d = _dev(preds_np[fi_p], pair_sh)
    pm_d = _dev(preds_np[mi_p], pair_sh)
    sf_d = _dev(segs_np[fi_p], pair_sh)
    sm_d = _dev(segs_np[mi_p], pair_sh)
    disps_lr = coarse_fn(pf_d, pm_d, np.float32(convex_setting.nn_mult))

    S = len(adam_settings)
    dice = np.zeros((S, 4, 4, 2))
    jstd = np.zeros((S, 4, 4, 2))
    hd = np.zeros((S, 4, 4))
    times = np.zeros(S)

    ck = SweepCheckpointer(checkpoint_path) if checkpoint_path is not None else None
    completed: set = set()
    if ck is not None and resume:
        st = ck.restore()
        if st is not None and "completed" in st and st["dice"].shape == dice.shape:
            dice[:], jstd[:], hd[:], times[:] = (
                st["dice"], st["jstd"], st["hd95"], st["times"]
            )
            completed = {int(i) for i in st["completed"]}
    rescored, rescore_sec = 0, 0.0  # cap-overflow audit (this run only)

    def make_fn(grid_sp_adam: int, avg_n: int):
        def pair_fn(pf, pm, sf, sm, dl, mult, lw):
            dice_g, js_g, nf_g, sw_g = _stage2_pair(
                pf, pm, sf, sm, dl, mult, lw,
                grid_sp_adam=grid_sp_adam, avg_n=avg_n, num_labels=num_labels,
                feat_dtype=feat_dtype,
            )
            if compute_hd95:
                return dice_g, js_g, nf_g, sw_g
            return dice_g, js_g, nf_g  # warped segs DCE'd — saves HBM
        if mesh is None:
            # SEQUENTIAL over pairs on a single device: the pair vmap only
            # buys concurrency when the pair axis is sharded over a mesh —
            # one chip executes serially anyway (ROADMAP round-4 overlap
            # measurement), while vmap makes XLA materialize every pair's
            # Adam state at once (8 pairs x 112-channel f32 corner stacks
            # = 3.6 GB at L2R scale; observed stage-2 OOM, round 5)
            f1 = lambda pf, pm, sf, sm, dl, mult, lw: jax.lax.map(  # noqa: E731
                lambda a: pair_fn(*a, mult, lw), (pf, pm, sf, sm, dl)
            )
            f = jax.vmap(                                           # settings
                f1, in_axes=(None, None, None, None, None, None, 0)
            )
            return jax.jit(f)
        f = jax.vmap(pair_fn, in_axes=(0, 0, 0, 0, 0, None, None))  # pairs
        f = jax.vmap(                                               # settings
            f, in_axes=(None, None, None, None, None, None, 0)
        )
        n_out = 4 if compute_hd95 else 3
        return jax.jit(
            f,
            in_shardings=(pair_sh, pair_sh, pair_sh, pair_sh, pair_sh, rep_sh, set_sh),
            out_shardings=(out_sh,) * n_out,
        )

    compiled = {}
    hd95_mode = _resolve_hd95_mode(
        hd95_mode, segs_np.shape[1:], jax.default_backend()
    )
    hd95_fn = None
    if compute_hd95 and hd95_mode == "device":
        label_groups, k_global = _suggest_label_groups(segs_np, num_labels)
        hd95_fn = _make_hd95_batch_fn(
            mesh, num_labels,
            label_groups=label_groups, global_surface=k_global,
        )
    gt_sharded = sf_d if hd95_fn is not None else None
    # fixed-side preamble once per SWEEP (shared by every setting batch)
    hd95_sides = hd95_fn.prep(gt_sharded) if hd95_fn is not None else None
    chunks = _chunked_setting_groups(
        adam_settings,
        lambda st: (st.grid_sp_adam, st.effective_avg_n),
        setting_batch,
    )

    if pair_chunk is None:
        env_pc = os.environ.get("CONVEXADAM_STAGE2_PAIR_CHUNK")
        pair_chunk = int(env_pc) if env_pc else None

    def _pc_for(key) -> int:
        """Pair-axis execution chunk for a shape class (``pair_chunk``)."""
        if mesh is not None:
            return P_pad
        if pair_chunk is not None:
            return max(1, min(P, pair_chunk))
        return 2 if key[0] == 1 else P  # key[0] == grid_sp_adam

    def _example_args(key):
        pc = _pc_for(key)
        if mesh is not None or pc >= P:
            return (pf_d, pm_d, sf_d, sm_d, disps_lr,
                    np.float32(convex_setting.nn_mult),
                    _mg(np.zeros(setting_batch, np.float32), set_sh))
        # chunked classes AOT-compile for the chunk's pair count; shape
        # structs keep the compile-ahead workers chipless
        f32 = np.dtype(np.float32)

        def sds(x):
            return jax.ShapeDtypeStruct((pc,) + x.shape[1:], x.dtype)

        return (sds(pf_d), sds(pm_d), sds(sf_d), sds(sm_d), sds(disps_lr),
                jax.ShapeDtypeStruct((), f32),
                jax.ShapeDtypeStruct((setting_batch,), f32))

    futs = _compile_ahead(make_fn, chunks, completed, _example_args)
    for key, idxs in chunks:
        if completed.issuperset(idxs):
            continue  # resume: this batch is already in the checkpoint
        if key not in compiled:
            compiled[key] = (
                futs[key].result() if futs is not None else make_fn(*key)
            )
        lws = _pad_axis0(
            np.array([adam_settings[i].lambda_weight for i in idxs], np.float32),
            setting_batch,
        )
        mult = np.float32(convex_setting.nn_mult)
        lws_g = _mg(lws, set_sh)
        pc = _pc_for(key)
        t0 = time.time()
        if mesh is not None or pc >= P:
            spans = [(0, P_pad)]  # one full program (meshed / light class)
        else:
            spans = [(i0, min(P, i0 + pc)) for i0 in range(0, P, pc)]
        parts = []   # per-chunk host pieces: (dg, jg, ng, hd, ov, sw)
        pend = []    # overflow chunks held on device for the exact rescore
        jfn = None   # jit fallback for a ragged final chunk (P % pc != 0)
        for i0, i1 in spans:
            nv = min(i1, P) - i0  # valid (non-padded) pairs in this chunk
            full = i0 == 0 and i1 >= P
            if full:
                a = (pf_d, pm_d, sf_d, sm_d, disps_lr)
                gt_c, sides_c = gt_sharded, hd95_sides
            else:
                a = tuple(x[i0:i1] for x in (pf_d, pm_d, sf_d, sm_d, disps_lr))
                gt_c = gt_sharded[i0:i1] if gt_sharded is not None else None
                sides_c = (
                    jax.tree_util.tree_map(lambda x: x[i0:i1], hd95_sides)
                    if hd95_sides is not None
                    else None
                )
            if full or i1 - i0 == pc:
                fn = compiled[key]
            else:
                jfn = jfn if jfn is not None else make_fn(*key)
                fn = jfn  # jit re-specializes for the tail's pair count
            out = fn(*a, mult, lws_g)
            hd_c = ov_c = sw_c = None
            if compute_hd95:
                dice_g, js_g, nf_g, sw_g = out
                if hd95_fn is not None:
                    # (G, nv, 4, 4) per-case label-mean HD95, on device;
                    # padded setting rows dropped so the rescore never
                    # duplicates work
                    hd_dev, ov_dev = hd95_fn(gt_c, sw_g, sides_c)
                    hd_c = np.asarray(hd_dev)[: len(idxs), :nv].copy()
                    ov_c = np.asarray(ov_dev)[: len(idxs), :nv]
                    if ov_c.any():
                        pend.append((hd_c, ov_c, sw_g, fi[i0: i0 + nv]))
                else:
                    sw_c = np.asarray(sw_g)[:, :nv]  # (G, nv, 4, 4, H, W, D)
            else:
                dice_g, js_g, nf_g = out
            parts.append((
                np.asarray(dice_g)[:, :nv],  # (G, nv, 4, 4, L)
                np.asarray(js_g)[:, :nv],
                np.asarray(nf_g)[:, :nv],
                hd_c, ov_c, sw_c,
            ))
            # release this chunk's device buffers before the next executes
            # (overflow chunks keep their warped segs alive via `pend`)
            out = dice_g = js_g = nf_g = sw_g = None  # noqa: F841
            hd_dev = ov_dev = gt_c = sides_c = a = None  # noqa: F841
        dt = (time.time() - t0) / len(idxs)
        for hd_c, ov_c, sw_g_c, fi_c in pend:
            # outside the timed window (rare fallback, volume downloads);
            # mutates hd_c in place BEFORE the concatenation below
            n_r, t_r = _rescore_overflows(
                hd_c, ov_c, sw_g_c, segs_np, fi_c, num_labels
            )
            rescored += n_r
            rescore_sec += t_r
        pend = None
        dg = np.concatenate([p[0] for p in parts], axis=1)
        jg = np.concatenate([p[1] for p in parts], axis=1)
        ng = np.concatenate([p[2] for p in parts], axis=1)
        hd_batch = (
            np.concatenate([p[3] for p in parts], axis=1)
            if parts[0][3] is not None
            else None
        )
        sw = (
            np.concatenate([p[5] for p in parts], axis=1)
            if parts[0][5] is not None
            else None
        )
        parts = None
        for g, s in enumerate(idxs):
            st = adam_settings[s]
            dice[s, :, :, 0] = dg[g].mean(axis=(0, 3))
            dice[s, :, :, 1] = np.mean(
                [dg[g, i][:, :, robust30[i]].mean(-1) for i in range(P)], axis=0
            )
            jstd[s, :, :, 0] = jg[g].mean(0)
            jstd[s, :, :, 1] = ng[g].mean(0)
            if hd_batch is not None:
                hd[s] = hd_batch[g].mean(axis=0)
            elif compute_hd95:
                for ii in range(4):
                    for kk in range(4):
                        hd[s, ii, kk] = np.mean(
                            [
                                hd95(
                                    segs_np[fi[i]],
                                    sw[g, i, ii, kk].round().astype(np.int32),
                                    num_labels,
                                ).mean()
                                for i in range(P)
                            ]
                        )
            times[s] = dt
            if verbose:
                print(
                    f"s={s} {st} best dice={dice[s,...,0].max():.4f} "
                    f"t={times[s]:.2f}s"
                )
        completed.update(int(i) for i in idxs)
        # device buffers were already released per chunk (the warped-seg
        # batch alone is ~2 GB at L2R scale — holding it across the rebind
        # doubled the live set and runtime-OOM'd the 100-setting protocol
        # at the grid_sp_adam=1 classes); drop the host pieces too
        dg = jg = ng = sw = hd_batch = None  # noqa: F841
        if ck is not None:
            ck.save(dict(dice=dice, jstd=jstd, hd95=hd, times=times,
                         completed=np.array(sorted(completed), np.int64)))

    flat_dice = dice[..., 0].reshape(-1)
    flat_drob = dice[..., 1].reshape(-1)
    flat_jstd = jstd[..., 0].reshape(-1)
    flat_hd = hd.reshape(-1)
    # As in stage 1: only rank on HD95 when it was computed, otherwise the
    # all-zeros placeholder would corrupt the aggregation (VERDICT r1 weak#1).
    ranks2 = [
        sort_rank(-flat_dice),
        sort_rank(-flat_drob),
        sort_rank(flat_jstd),
    ]
    if compute_hd95:
        ranks2.append(sort_rank(flat_hd))
    rank2 = rank_product(ranks2)
    return SweepResult(
        dice.reshape(S * 16, 2),
        jstd.reshape(S * 16, 2),
        flat_hd,
        times,
        rank2,
        int(rank2.argmax()),
        rescored,
        rescore_sec,
    )
