"""Paired intra-patient sweeps (MIND features, keypoint TRE metric).

Reference: convex_run_paired_mind.py (stage 1) and
adam_run_paired_mind_shiftSpline.py (stage 2) — lung-CT style exhale/inhale
registration evaluated by keypoint target registration error.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.adam import adam_instance_optimisation
from convexadam_tpu.core.features import mindssc
from convexadam_tpu.core.metrics import (
    jacobian_determinant,
    keypoint_tre,
    rank_product,
    sort_rank,
)
from convexadam_tpu.core.smoothing import avg_pool3d, box_smooth_repeated
from convexadam_tpu.core.warp import resize_trilinear
from convexadam_tpu.selfconfig.engine import SweepResult, convex_field_mind
from convexadam_tpu.selfconfig.settings import (
    STAGE2_SNAPSHOT_ITERS,
    Stage1PairedSetting,
    Stage2Setting,
)


def _robust30_keypoints(kf: np.ndarray, km: np.ndarray) -> np.ndarray:
    """Indices of the 30% keypoints with the largest initial error
    (convex_run_paired_mind.py:90-92)."""
    tre0 = np.sqrt(((kf - km) ** 2).sum(-1))
    k = int(len(tre0) * 0.3)
    return np.argsort(-tre0)[: max(k, 1)]


def _padded_keypoints(kpts_fixed, kpts_moving, robust30):
    """Pad per-pair keypoint lists to one (P, n_max, 3) batch with validity
    and robust30 weight masks, so a single vmapped device program evaluates
    every pair (case keypoint counts differ; masked means equal the ragged
    per-pair means exactly — the weights are 0/1)."""
    P = len(kpts_fixed)
    n_max = max(len(np.asarray(k)) for k in kpts_fixed)
    kf = np.zeros((P, n_max, 3), np.float32)
    km = np.zeros((P, n_max, 3), np.float32)
    mask = np.zeros((P, n_max), np.float32)
    rmask = np.zeros((P, n_max), np.float32)
    for i in range(P):
        a = np.asarray(kpts_fixed[i], np.float32)
        b = np.asarray(kpts_moving[i], np.float32)
        n = len(a)
        kf[i, :n], km[i, :n], mask[i, :n] = a, b, 1.0
        rmask[i, robust30[i]] = 1.0
    return (jnp.asarray(kf), jnp.asarray(km),
            jnp.asarray(mask), jnp.asarray(rmask))


def _field_metrics(disp, kf, km, mask, rmask, spacing):
    """(tre_mean, tre_robust30, sdlogj, neg_jac_frac) of one field as FOUR
    device scalars — the full Jacobian volume and per-keypoint TRE vector
    never cross the host link (np.asarray of big arrays streams at
    ~17 MB/s through the TPU tunnel; a (H,W,D) det volume per variant
    dominated the sweep wall-clock)."""
    t = keypoint_tre(disp, kf, km, spacing)
    tm = jnp.sum(t * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    tr = jnp.sum(t * rmask) / jnp.maximum(jnp.sum(rmask), 1.0)
    det = jacobian_determinant(disp)
    logd = jnp.log(jnp.clip(det + 3.0, 1e-9, 1e9))
    return jnp.stack(
        [tm, tr, jnp.std(logd), jnp.mean((det < 0).astype(jnp.float32))]
    )


def _paired_batch(imgs_fixed, imgs_moving, kpts_fixed, kpts_moving, mesh):
    """Shared pair-axis setup of both paired sweeps: robust30 masks, padded
    keypoint batches, and (with a ``mesh``) the pair dimension padded to the
    shard count and committed to the devices once with a ``pair`` sharding —
    the reference's process-per-GPU fan-out (convex_run_paired_mind.py) as
    one SPMD program, like the semantic engine's sweeps."""
    from convexadam_tpu.selfconfig.engine import (  # noqa: PLC0415
        _dev,
        _mesh_factors,
        _pad_axis0,
        _sweep_specs,
    )

    P = imgs_fixed.shape[0]
    robust30 = [
        _robust30_keypoints(np.asarray(kpts_fixed[i]), np.asarray(kpts_moving[i]))
        for i in range(P)
    ]
    kf, km, mask, rmask = _padded_keypoints(kpts_fixed, kpts_moving, robust30)
    _, n_pair_shards = _mesh_factors(mesh)
    pair_sh, _, rep_sh, _ = _sweep_specs(mesh)
    P_pad = -(-P // n_pair_shards) * n_pair_shards
    batch = [
        _dev(_pad_axis0(np.asarray(a, np.float32), P_pad), pair_sh)
        for a in (imgs_fixed, imgs_moving, kf, km, mask, rmask)
    ]
    return P, batch, pair_sh, rep_sh


def run_stage1_paired_sweep(
    imgs_fixed: np.ndarray,
    imgs_moving: np.ndarray,
    kpts_fixed: Sequence[np.ndarray],
    kpts_moving: Sequence[np.ndarray],
    settings: Sequence[Stage1PairedSetting],
    spacing: Optional[np.ndarray] = None,
    verbose: bool = False,
    mesh=None,
) -> SweepResult:
    """Stage-1 paired sweep: for each setting x pair, run the convex stage on
    MIND features and score keypoint TRE (mean + robust30) and SDlogJ
    (convex_run_paired_mind.py:104-204).

    With a ``mesh`` (any mesh with a ``pair`` axis, e.g.
    ``parallel.batch.make_sweep_mesh``) the pair axis shards across
    devices; settings stay a host loop — each changes MIND radius/grid
    shapes, so there is no shared program to batch over."""
    S = len(settings)
    tre = np.zeros((S, 2))
    jstd = np.zeros((S, 2))
    times = np.zeros(S)

    P, batch, pair_sh, rep_sh = _paired_batch(
        imgs_fixed, imgs_moving, kpts_fixed, kpts_moving, mesh
    )
    imgs_f, imgs_m, kf_p, km_p, mask_p, rmask_p = batch
    sp_j = None if spacing is None else jnp.asarray(spacing, jnp.float32)
    eval_kw = {} if mesh is None else dict(
        in_shardings=(pair_sh,) * 5 + ((rep_sh,) if sp_j is not None else (None,)),
        out_shardings=pair_sh,
    )
    eval_fn = jax.jit(
        jax.vmap(_field_metrics, in_axes=(0, 0, 0, 0, 0, None)), **eval_kw
    )

    compiled = {}
    for s, st in enumerate(settings):
        key = (st.mind_r, st.mind_d, st.grid_sp, st.disp_hw)
        if key not in compiled:
            jit_kw = {} if mesh is None else dict(
                in_shardings=(pair_sh, pair_sh), out_shardings=pair_sh
            )
            compiled[key] = jax.jit(
                jax.vmap(
                    lambda f, m, _k=key: convex_field_mind(
                        f, m, mind_r=_k[0], mind_d=_k[1],
                        grid_sp=_k[2], disp_hw=_k[3],
                    )
                ),
                **jit_kw,
            )
        t0 = time.time()
        disps = compiled[key](imgs_f, imgs_m)  # (P_pad, 3, H, W, D)
        # 4 scalars per pair cross the host link, not det volumes
        mets = np.asarray(
            eval_fn(disps, kf_p, km_p, mask_p, rmask_p, sp_j)
        )[:P]
        tre[s] = mets[:, :2].mean(axis=0)
        jstd[s] = mets[:, 2:].mean(axis=0)
        times[s] = time.time() - t0
        if verbose:
            print(f"s={s} {st} TRE={tre[s,0]:.3f}/{tre[s,1]:.3f} jstd={jstd[s,0]:.4f}")

    # rank product over {tre, tre30, jstd} (convex_run_paired_mind.py:190-199)
    rank1 = rank_product(
        [sort_rank(tre[:, 0]), sort_rank(tre[:, 1]), sort_rank(jstd[:, 0])]
    )
    return SweepResult(tre, jstd, np.zeros(S), times, rank1, int(rank1.argmax()))


def run_stage2_paired_sweep(
    imgs_fixed: np.ndarray,
    imgs_moving: np.ndarray,
    kpts_fixed: Sequence[np.ndarray],
    kpts_moving: Sequence[np.ndarray],
    convex_setting: Stage1PairedSetting,
    adam_settings: Sequence[Stage2Setting],
    spacing: Optional[np.ndarray] = None,
    verbose: bool = False,
    mesh=None,
) -> SweepResult:
    """Stage-2 paired sweep: Adam refinement with the shift-spline smoother
    bank, evaluated at {60,80,100,120} iters x 4 smoothing levels by TRE
    (adam_run_paired_mind_shiftSpline.py:160-296).

    With a ``mesh`` the pair axis shards like stage 1 (settings sharing a
    (grid_sp_adam, avg_n) shape key still compile once; lambda is traced)."""
    H, W, D = imgs_fixed.shape[1:]
    P, batch, pair_sh, rep_sh = _paired_batch(
        imgs_fixed, imgs_moving, kpts_fixed, kpts_moving, mesh
    )
    imgs_f, imgs_m, kf_p, km_p, mask_p, rmask_p = batch

    # pass A: cached convex fields (full-res)
    conv_kw = {} if mesh is None else dict(
        in_shardings=(pair_sh, pair_sh), out_shardings=pair_sh
    )
    conv_fn = jax.jit(
        jax.vmap(
            lambda f, m: convex_field_mind(
                f, m, mind_r=convex_setting.mind_r, mind_d=convex_setting.mind_d,
                grid_sp=convex_setting.grid_sp, disp_hw=convex_setting.disp_hw,
            )
        ),
        **conv_kw,
    )
    disps_hr0 = conv_fn(imgs_f, imgs_m)

    S = len(adam_settings)
    tre = np.zeros((S, 4, 4, 2))
    jstd = np.zeros((S, 4, 4, 2))
    times = np.zeros(S)

    sp_j = None if spacing is None else jnp.asarray(spacing, jnp.float32)

    compiled = {}
    for s, st in enumerate(adam_settings):
        t0 = time.time()
        g2 = st.grid_sp_adam
        key = (g2, st.effective_avg_n)
        if key not in compiled:
            # metrics are folded INTO the per-pair program: a full-res field
            # per (pair, iter, smooth) variant would be a (P,4,4,3,H,W,D)
            # HBM buffer (~1.5 GB x P at lung scale) plus a ~17 MB/s tunnel
            # download per det volume — only (P,4,4,4) scalars leave
            def one_pair(f, m, d0, lw, kf, km, msk, rmsk,
                         _g=g2, _a=st.effective_avg_n):
                ff = mindssc(f, convex_setting.mind_r, convex_setting.mind_d)
                fm = mindssc(m, convex_setting.mind_r, convex_setting.mind_d)
                pf = avg_pool3d(ff, _g, stride=_g)
                pm = avg_pool3d(fm, _g, stride=_g)
                dlr = resize_trilinear(
                    d0, (H // _g, W // _g, D // _g), align_corners=False
                )
                _, snaps = adam_instance_optimisation(
                    pf, pm, dlr / _g, lw, niter=120,
                    snapshot_iters=STAGE2_SNAPSHOT_ITERS,
                    smoother=("bank", _a), cost_scale=12.0,
                )

                def variants(field_lr):
                    dhr = resize_trilinear(
                        field_lr * _g, (H, W, D), align_corners=False
                    )
                    outs = []
                    for kk in range(4):
                        if kk > 0:
                            dhr = box_smooth_repeated(dhr, 3, 1)
                        outs.append(
                            _field_metrics(dhr, kf, km, msk, rmsk, sp_j)
                        )
                    return jnp.stack(outs)  # (4 smooth, 4 metrics)

                return jax.vmap(variants)(snaps)  # (4 iters, 4 smooth, 4)

            jit_kw = {} if mesh is None else dict(
                in_shardings=(
                    pair_sh, pair_sh, pair_sh, rep_sh,
                    pair_sh, pair_sh, pair_sh, pair_sh,
                ),
                out_shardings=pair_sh,
            )
            compiled[key] = jax.jit(
                jax.vmap(one_pair, in_axes=(0, 0, 0, None, 0, 0, 0, 0)),
                **jit_kw,
            )
        mets = np.asarray(compiled[key](
            imgs_f, imgs_m, disps_hr0, jnp.float32(st.lambda_weight),
            kf_p, km_p, mask_p, rmask_p,
        ))[:P]  # (P, 4 iters, 4 smooth, 4 metrics)
        tre[s] = mets[..., :2].mean(axis=0)
        jstd[s] = mets[..., 2:].mean(axis=0)
        times[s] = time.time() - t0
        if verbose:
            print(f"s={s} {st} best TRE={tre[s,...,0].min():.3f}")

    flat_tre = tre[..., 0].reshape(-1)
    flat_tre30 = tre[..., 1].reshape(-1)
    flat_jstd = jstd[..., 0].reshape(-1)
    rank2 = rank_product(
        [sort_rank(flat_tre), sort_rank(flat_tre30), sort_rank(flat_jstd)]
    )
    return SweepResult(
        tre.reshape(S * 16, 2), jstd.reshape(S * 16, 2),
        np.zeros(S * 16), times, rank2, int(rank2.argmax()),
    )
