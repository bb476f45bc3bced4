"""Coupled convex optimisation — the global discrete regularizer.

Reference: ``coupled_convex`` (src/convexAdam/convex_adam_utils.py:93-109).
Starting from the box-smoothed argmin displacement field, six outer iterations
with increasing coupling strengths alternately (a) pick, per coarse voxel, the
displacement minimising ``ssd[k] + c * ||d_k - disp_soft||^2`` and (b)
box-smooth the selected displacement field.

TPU-native notes:
* The reference's inner loop over H-slices (convex_adam_utils.py:102-105)
  exists only to bound GPU memory; here the argmin is evaluated over the full
  volume at once and XLA fuses the coupling term into the argmin reduction,
  so the (K^3, N) "coupled" tensor is never materialised.
* ``argmin_k(ssd[k] + c*||d_k - s||^2)`` can also be computed via the MXU as
  ``argmin_k(ssd[k] + c*||d_k||^2 - 2c * (D^T s)[k])`` (a (K^3,3)x(3,N)
  matmul); this is the default on TPU (``use_mxu=None`` resolves by
  backend).  Mathematically identical; fp rounding tie-breaks argmins
  differently in rare cells.  Drift study on the ¼-v5e chip with realistic
  MIND cost volumes (192^3 case, grid_sp=6, disp_hw=4): per-iteration
  argmin drift 3e-5..7e-4 of voxels, final field delta max 0.185 / mean
  0.0005 coarse voxels (1.1% voxels nonzero delta) — far inside the Adam
  refinement basin and the golden/bf16 accuracy envelopes; 12.8 → 9.0 ms
  per direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.smoothing import avg_pool3d

COUPLING_COEFFS = (0.003, 0.01, 0.03, 0.1, 0.3, 1.0)


def _gather_disp(disp_mesh: jax.Array, argmin: jax.Array) -> jax.Array:
    """disp_mesh (3, K^3) gathered at argmin (H,W,D) → field (3, H, W, D)."""
    return jnp.take(disp_mesh, argmin.reshape(-1), axis=1).reshape(
        (3,) + argmin.shape
    )


@functools.partial(jax.jit, static_argnames=("use_mxu",))
def coupled_convex(
    ssd: jax.Array,
    ssd_argmin: jax.Array,
    disp_mesh: jax.Array,
    use_mxu: "bool | None" = None,
) -> jax.Array:
    """Solve the coupled convex problem.

    Args:
      ssd: (K^3, H', W', D') cost volume from :func:`correlate`.
      ssd_argmin: (H', W', D') initial argmin.
      disp_mesh: (3, K^3) displacement mesh (array-order channels).
      use_mxu: None → MXU form on TPU, exact VPU form elsewhere (see module
        docstring for the tie-break drift study).

    Returns:
      disp_soft: (3, H', W', D') regularized displacement field in coarse-grid
      voxel units.
    """
    if use_mxu is None:
        use_mxu = jax.default_backend() == "tpu"
    shape = ssd.shape[1:]
    n = ssd.shape[0]
    ssd_flat = ssd.reshape(n, -1)

    disp_soft = avg_pool3d(_gather_disp(disp_mesh, ssd_argmin), 3, stride=1, padding=1)

    for c in COUPLING_COEFFS:
        s = disp_soft.reshape(3, -1)
        if use_mxu:
            bias = jnp.sum(disp_mesh * disp_mesh, axis=0)  # (K^3,)
            cross = jnp.dot(
                disp_mesh.T, s, preferred_element_type=jnp.float32
            )  # (K^3, N)
            coupled = ssd_flat + c * bias[:, None] - (2.0 * c) * cross
        else:
            diff = disp_mesh[:, :, None] - s[:, None, :]  # (3, K^3, N)
            coupled = ssd_flat + c * jnp.sum(diff * diff, axis=0)
        argmin = jnp.argmin(coupled, axis=0).reshape(shape)
        disp_soft = avg_pool3d(_gather_disp(disp_mesh, argmin), 3, stride=1, padding=1)

    return disp_soft


@functools.partial(
    jax.jit,
    static_argnames=("disp_hw", "metric", "smooth_passes", "compute_dtype"),
)
def correlate_coupled_streamed(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hw: int,
    metric: str = "ssd",
    smooth_passes: int = 2,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Cost volume + coupled convex WITHOUT materialising the (K³, N) array.

    Large sweep settings overflow HBM with the dense volume — e.g.
    ``grid_sp=2, disp_hw=7`` at 192×160×256 needs ~6.6 GB *per direction*
    in bf16 and fails to compile on this chip (the reference bounds memory
    with its H-slice inner loop instead, convex_adam_utils.py:102-105).
    This path re-evaluates the per-candidate smoothed cost inside a
    ``lax.scan`` over the K³ candidates for the initial argmin AND each of
    the six coupling iterations, carrying only a running (best, argmin)
    pair — peak memory is a few coarse volumes; compute is 7× the one-pass
    cost volume (cheap: MXU-free VPU work on coarse grids).

    Numerics: per-candidate cost and box smoothing are element-wise
    identical to :func:`~convexadam_tpu.core.cost_volume.correlate`'s XLA
    path, and the running strict-``<`` update keeps the FIRST minimal
    candidate exactly like ``jnp.argmin`` — bit-equal to
    ``coupled_convex(..., use_mxu=False)`` on the materialised volume.

    Returns ``disp_soft`` (3, H', W', D') in coarse-grid voxel units.
    """
    from convexadam_tpu.core.cost_volume import displacement_mesh

    q = disp_hw
    K = 2 * q + 1
    C, H, W, D = feat_fix.shape
    fix = feat_fix.astype(compute_dtype)
    movp = jnp.pad(
        feat_mov.astype(compute_dtype),
        ((0, 0), (q, q), (q, q), (q, q)),
        mode="constant",
    )
    ks = np.arange(K**3)
    offs = jnp.asarray(
        np.stack([ks % K, (ks // K) % K, ks // (K * K)], axis=1), jnp.int32
    )
    mesh = displacement_mesh(q)  # (3, K^3)
    mesh_t = mesh.T  # (K^3, 3)

    def smoothed_cost(off):
        sl = jax.lax.dynamic_slice(
            movp, (0, off[0], off[1], off[2]), (C, H, W, D)
        )
        d = fix - sl
        cost = jnp.abs(d) if metric == "sad" else d * d
        cost = jnp.sum(cost, axis=0)
        for _ in range(smooth_passes):
            cost = avg_pool3d(cost, 3, stride=1, padding=1)
        return cost.astype(jnp.float32)

    big = jnp.float32(np.finfo(np.float32).max)

    def argmin_pass(extra_fn):
        """Scan candidates, carrying (best value, argmin); ``extra_fn``
        adds the coupling term for a candidate (or 0 for the init pass)."""

        def body(carry, ko):
            k, off = ko
            best, bidx = carry
            s = smoothed_cost(off) + extra_fn(k)
            better = s < best
            return (
                jnp.where(better, s, best),
                jnp.where(better, k, bidx),
            ), None

        init = (
            jnp.full((H, W, D), big, jnp.float32),
            jnp.zeros((H, W, D), jnp.int32),
        )
        (_, am), _ = jax.lax.scan(
            body, init, (jnp.asarray(ks, jnp.int32), offs)
        )
        return am

    am0 = argmin_pass(lambda k: jnp.float32(0.0))
    disp_soft = avg_pool3d(_gather_disp(mesh, am0), 3, stride=1, padding=1)

    for c in COUPLING_COEFFS:
        ds = disp_soft  # captured per-iteration

        def coupling(k, ds=ds):
            dk = mesh_t[k]  # (3,)
            diff = dk.reshape(3, 1, 1, 1) - ds
            return jnp.float32(c) * jnp.sum(diff * diff, axis=0)

        am = argmin_pass(coupling)
        disp_soft = avg_pool3d(_gather_disp(mesh, am), 3, stride=1, padding=1)

    return disp_soft


def convex_displacement_tp(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hw: int,
    mesh,
    axis_name: str = "disp",
    metric: str = "ssd",
    smooth_passes: int = 2,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Tensor-parallel convex stage: the (2q+1)^3 displacement-candidate
    axis sharded across the ``axis_name`` axis of ``mesh`` (SURVEY §2.6 TP
    row).

    Each device materialises only its candidate slice of the dense cost
    volume (memory per device = dense/n_devices — the multi-chip answer to
    configs whose volume overflows one chip's HBM, e.g. grid_sp=2/disp_hw=7
    at L2R scale needs ~27 GB dense), evaluates the coupling term for its
    local candidates, and the per-voxel global argmin is recovered with two
    ``lax.pmin`` collectives per iteration (value min, then
    first-minimal-index min) — bit-identical to ``jnp.argmin`` over the
    full axis, hence to :func:`coupled_convex` with ``use_mxu=False`` and
    to :func:`correlate_coupled_streamed`.

    Returns ``disp_soft`` (3, H', W', D') in coarse voxels, replicated.
    """
    q = disp_hw
    K = 2 * q + 1
    K3 = K**3
    ndev = int(np.prod([
        s for s, n in zip(mesh.devices.shape, mesh.axis_names)
        if n == axis_name
    ]))
    K3_pad = -(-K3 // ndev) * ndev
    # pad with the LAST candidate: duplicates have higher global index, so
    # the first-minimal-index pmin never prefers them
    ks = np.concatenate(
        [np.arange(K3), np.full(K3_pad - K3, K3 - 1)]
    ).astype(np.int32)
    fn = _tp_convex_fn(
        mesh, axis_name, disp_hw, metric, smooth_passes, compute_dtype
    )
    return fn(jnp.asarray(ks), feat_fix, feat_mov)


@functools.lru_cache(maxsize=16)
def _tp_convex_fn(
    mesh, axis_name, disp_hw, metric, smooth_passes, compute_dtype
):
    """Build + memoise the jitted shard_map program for
    :func:`convex_displacement_tp` (``Mesh`` is hashable, so equal meshes
    share the entry): a fresh closure per call would re-trace — and
    round-trip the slow remote compiler's cache — on EVERY direction of
    every pair."""
    from jax.sharding import PartitionSpec
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map  # type: ignore

    from convexadam_tpu.core.cost_volume import displacement_mesh

    q = disp_hw
    K = 2 * q + 1
    K3 = K**3
    mesh_d = displacement_mesh(q)  # (3, K^3), replicated
    big_idx = jnp.int32(K3)

    def local_fn(ks_local, ff, fm):
        C, H, W, D = ff.shape
        fix = ff.astype(compute_dtype)
        movp = jnp.pad(
            fm.astype(compute_dtype),
            ((0, 0), (q, q), (q, q), (q, q)),
            mode="constant",
        )
        offs = jnp.stack(
            [ks_local % K, (ks_local // K) % K, ks_local // (K * K)], axis=1
        )

        def body(_, off):
            sl = jax.lax.dynamic_slice(
                movp, (0, off[0], off[1], off[2]), (C, H, W, D)
            )
            d = fix - sl
            cost = jnp.abs(d) if metric == "sad" else d * d
            return None, jnp.sum(cost, axis=0)

        _, ssd = jax.lax.scan(body, None, offs)  # (K3_local, H, W, D)
        for _ in range(smooth_passes):
            ssd = avg_pool3d(ssd, 3, stride=1, padding=1)
        ssd_flat = ssd.reshape(ssd.shape[0], -1).astype(jnp.float32)
        mesh_local = mesh_d[:, ks_local]  # (3, K3_local)

        def global_argmin(coupled):
            """coupled: (K3_local, N) → (N,) global first-minimal index."""
            lmin = jnp.min(coupled, axis=0)
            larg = ks_local[jnp.argmin(coupled, axis=0)]
            gmin = jax.lax.pmin(lmin, axis_name)
            cand = jnp.where(lmin == gmin, larg, big_idx)
            return jax.lax.pmin(cand, axis_name)

        am = global_argmin(ssd_flat).reshape(H, W, D)
        disp_soft = avg_pool3d(
            _gather_disp(mesh_d, am), 3, stride=1, padding=1
        )
        for c in COUPLING_COEFFS:
            s = disp_soft.reshape(3, -1)
            diff = mesh_local[:, :, None] - s[:, None, :]
            coupled = ssd_flat + c * jnp.sum(diff * diff, axis=0)
            am = global_argmin(coupled).reshape(H, W, D)
            disp_soft = avg_pool3d(
                _gather_disp(mesh_d, am), 3, stride=1, padding=1
            )
        return disp_soft

    spec_sharded = PartitionSpec(axis_name)
    spec_rep = PartitionSpec()
    kwargs = dict(
        mesh=mesh,
        in_specs=(spec_sharded, spec_rep, spec_rep),
        out_specs=spec_rep,
    )
    try:
        fn = shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:
        fn = shard_map(local_fn, check_rep=False, **kwargs)
    return jax.jit(fn)


# dense cost volumes whose estimated footprint (ssd + one smoothing
# temporary, i.e. 2x the raw volume) exceeds this dispatch to the streamed
# path.  Calibrated on the ~16 GB chip at 192x160x256: grid_sp=2/disp_hw=5
# (10.5 GB estimate) runs dense in 3.1 s vs 6.3 s streamed; grid_sp=2/
# disp_hw=7 (27 GB estimate) fails to compile dense and runs streamed in
# 12.7 s.
COST_VOLUME_STREAM_THRESHOLD = 12_000_000_000


def _cost_volume_voxels(shape, backend: str) -> int:
    """Per-candidate voxel count of a (K3, 1, H', W', D') cost-volume temp
    as ACTUALLY ALLOCATED: XLA:TPU tiles the two minor dims to (8, 128), so
    e.g. grid_sp=3 at 192x160x256 pads (64, 53, 85) to (64, 56, 128) —
    1.59x.  Sizing the stream-vs-dense estimate by the unpadded count let
    the (grid_sp=3, disp_hw=7) class compile dense and OOM the chip with
    two 5.77 GiB padded smoothing temps (100-setting protocol, round 5)."""
    dims = list(shape)
    if backend == "tpu" and len(dims) >= 2:
        dims[-1] = -(-dims[-1] // 128) * 128
        dims[-2] = -(-dims[-2] // 8) * 8
    return int(np.prod(dims))


def convex_displacement(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_hw: int,
    metric: str = "ssd",
    smooth_passes: int = 2,
    compute_dtype=jnp.float32,
    use_mxu: "bool | None" = None,
    stream_threshold: int = COST_VOLUME_STREAM_THRESHOLD,
) -> jax.Array:
    """One convex-stage direction: correlate + coupled convex, dispatching
    to :func:`correlate_coupled_streamed` when the dense (K³, N) volume
    would exceed ``stream_threshold`` bytes.

    Note: crossing the threshold switches a TPU run from the MXU
    coupled-convex form to the streamed exact-VPU-equivalent form, so
    argmin tie-breaks (~1% of cells, see module docstring) change
    discontinuously between near-identical configs — not a regression when
    comparing sweep settings across the boundary."""
    from convexadam_tpu.core.cost_volume import correlate, displacement_mesh

    K3 = (2 * disp_hw + 1) ** 3
    backend = jax.default_backend()
    n = _cost_volume_voxels(feat_fix.shape[1:], backend)
    # the TPU Pallas cost-volume path materialises the volume in float32
    # regardless of compute_dtype — size the estimate by what is actually
    # allocated, or bf16 configs near the threshold still fail to compile
    itemsize = jnp.dtype(compute_dtype).itemsize
    if metric == "ssd" and backend == "tpu":
        itemsize = max(itemsize, 4)
    if K3 * n * itemsize * 2 > stream_threshold:
        return correlate_coupled_streamed(
            feat_fix, feat_mov, disp_hw, metric=metric,
            smooth_passes=smooth_passes, compute_dtype=compute_dtype,
        )
    ssd, am = correlate(
        feat_fix, feat_mov, disp_hw, compute_dtype=compute_dtype,
        metric=metric, smooth_passes=smooth_passes,
    )
    return coupled_convex(ssd, am, displacement_mesh(disp_hw), use_mxu=use_mxu)
