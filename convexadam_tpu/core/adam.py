"""Adam instance optimisation — the local continuous refinement stage.

Reference: the per-case optimisation loop in src/convexAdam/convex_adam_MIND.py:147-191.
The only trainable parameter is a low-resolution displacement grid (the
reference wraps it in a dummy Conv3d to reuse torch's optimizer plumbing;
here it is just an array).  Each iteration:

  1. smooth the raw grid with three cascaded 3^3 zero-padded box filters
     (a cubic-B-spline-like kernel, convex_adam_MIND.py:166),
  2. diffusion regularizer: mean squared forward difference along each
     spatial axis, weighted by ``lambda_weight`` (:167-169),
  3. warp the pooled moving features by the smoothed grid
     (grid_sample, align_corners=False, zeros padding, :171-174),
  4. data term: channel-mean squared error * 12 (:176), plus (2), backprop,
     ``torch.optim.Adam(lr=1)`` step (:158,:179).

TPU-native: the loop is a ``lax.scan`` over optax updates so the whole stage
compiles to a single XLA while-loop; multi-output "snapshot" variants (the
self-configuring runners save the field at several iteration counts,
self_configuring/convex_adam_MIND.py:115-123) fall out for free by writing
the smoothed field into a static-size snapshot buffer inside the scan.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax
from jax import lax

from convexadam_tpu.core.smoothing import (
    box_smooth_repeated,
    gaussian_smooth,
    kovesi_spline,
)
from convexadam_tpu.core.warp import (
    build_corner_stack,
    warp_ssd_loss_and_grad,
    warp_ssd_mean_loss,
)

# stage-2 "shift-spline" smoother bank (adam_run_withconfig_shiftSpline.py:140-141):
# two Gaussians + six Kovesi box-cascade splines, indexed by ``avg_n``.
SMOOTHER_BANK: tuple[tuple, ...] = (
    ("gauss", 0.7),
    ("gauss", 1.0),
    ("kovesi", 1.3),
    ("kovesi", 1.6),
    ("kovesi", 1.9),
    ("kovesi", 2.2),
    ("kovesi", 2.5),
    ("kovesi", 2.8),
)


def resolve_smoother(spec: tuple):
    """Resolve a hashable smoother spec into a callable.

    Specs: ("box", kernel, repeats) — the packaged pipeline's cascade;
    ("gauss", sigma); ("kovesi", sigma[, n]); ("bank", avg_n) — index into
    :data:`SMOOTHER_BANK`.
    """
    kind = spec[0]
    if kind == "box":
        _, kernel, repeats = spec
        return lambda x: box_smooth_repeated(x, kernel, repeats)
    if kind == "gauss":
        return lambda x: gaussian_smooth(x, spec[1])
    if kind == "kovesi":
        n = spec[2] if len(spec) > 2 else 4
        return lambda x: kovesi_spline(x, spec[1], n)
    if kind == "bank":
        return resolve_smoother(SMOOTHER_BANK[spec[1]])
    raise ValueError(f"unknown smoother spec: {spec}")


def diffusion_regularizer(disp: jax.Array) -> jax.Array:
    """Mean squared forward differences along each spatial axis, summed.

    ``disp`` is (3, H, W, D).  Matches convex_adam_MIND.py:167-169 (each
    axis term is averaged over its own element count, channels included).
    """
    dh = disp[:, 1:, :, :] - disp[:, :-1, :, :]
    dw = disp[:, :, 1:, :] - disp[:, :, :-1, :]
    dd = disp[:, :, :, 1:] - disp[:, :, :, :-1]
    return jnp.mean(dh * dh) + jnp.mean(dw * dw) + jnp.mean(dd * dd)


def _sub_lattice(x: jax.Array, stride: int) -> jax.Array:
    """(C, h, w, d) → the ``(::stride,)*3`` spatial sub-lattice."""
    return x if stride == 1 else x[:, ::stride, ::stride, ::stride]


def _loss_fn(
    weight: jax.Array,
    feat_fix: jax.Array,
    feat_mov_stack: jax.Array,
    feat_mov_shape: tuple,
    lambda_weight,
    smooth_fn,
    cost_scale,
    stride: int = 1,
) -> tuple[jax.Array, jax.Array]:
    disp_sample = smooth_fn(weight)
    reg = lambda_weight * diffusion_regularizer(disp_sample)
    data = warp_ssd_mean_loss(
        feat_mov_stack, feat_mov_shape, _sub_lattice(disp_sample, stride),
        feat_fix, cost_scale, stride=stride,
    )
    return data + reg, disp_sample


def _grad_step_autodiff(
    weight, feat_fix, feat_mov_stack, feat_mov_shape, lambda_weight,
    smooth_fn, cost_scale, stride=1,
):
    (_, ds), g = jax.value_and_grad(_loss_fn, has_aux=True)(
        weight, feat_fix, feat_mov_stack, feat_mov_shape, lambda_weight,
        smooth_fn, cost_scale, stride,
    )
    return ds, g


def _grad_step_explicit(
    weight, fix_flat, feat_mov_stack, feat_mov_shape, lambda_weight,
    smooth_fn, cost_scale, interpret=False, stride=1,
):
    """One gradient evaluation with the chain rule composed by hand.

    Mathematically identical to :func:`_grad_step_autodiff`, but the data
    term goes through :func:`warp_ssd_loss_and_grad` (the fused Pallas
    kernel returns the displacement gradient directly) while only the cheap
    smoother/regularizer factors use ``jax.vjp`` — avoiding the
    ``custom_vjp`` call boundary that costs ~1.3 ms/iter at 96³ on TPU
    (sub-jaxpr DCE/fusion barrier, see warp.py:warp_ssd_loss_and_grad).

    With ``stride`` > 1 the data term is evaluated on the strided sample
    sub-lattice (``fix_flat`` carries the sub-lattice's fixed features);
    its gradient is padded back onto the full grid (zeros between samples —
    the exact vjp of the strided slice) before the smoother vjp spreads it.
    """
    ds, vjp_smooth = jax.vjp(smooth_fn, weight)
    _, vjp_reg = jax.vjp(diffusion_regularizer, ds)
    ds_sub, vjp_sub = jax.vjp(lambda x: _sub_lattice(x, stride), ds)
    _, d_data_sub = warp_ssd_loss_and_grad(
        feat_mov_stack, feat_mov_shape, ds_sub, fix_flat, cost_scale,
        interpret=interpret, stride=stride,
    )
    (d_data,) = vjp_sub(d_data_sub.reshape(ds_sub.shape))
    (d_reg,) = vjp_reg(jnp.asarray(lambda_weight, ds.dtype))
    (g,) = vjp_smooth(d_data + d_reg)
    return ds, g


@functools.partial(
    jax.jit,
    static_argnames=("niter", "snapshot_iters", "smoother", "sample_stride"),
)
def adam_instance_optimisation(
    feat_fix: jax.Array,
    feat_mov: jax.Array,
    disp_init: jax.Array,
    lambda_weight,
    niter: int,
    snapshot_iters: tuple[int, ...] = (),
    smoother: tuple = ("box", 3, 3),
    cost_scale=12.0,
    sample_stride: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Optimise a low-res displacement grid against pooled features.

    Args:
      feat_fix, feat_mov: (C, h, w, d) features pooled by ``grid_sp_adam``.
      disp_init: (3, h, w, d) initial displacement in **coarse voxel units**
        (the caller divides the full-res field by ``grid_sp_adam``,
        convex_adam_MIND.py:156).
      lambda_weight: diffusion weight (traced — one compile serves a sweep).
      niter: iteration count (static).
      smoother: hashable smoother spec (see :func:`resolve_smoother`); the
        packaged pipeline uses the triple 3^3 box cascade, the stage-2 sweep
        the Gaussian/Kovesi bank.
      cost_scale: data-term channel scale — 12 in the packaged pipelines
        (convex_adam_MIND.py:176), ``n_ch`` in the sweep scripts
        (adam_run_withconfig_shiftSpline.py:229).
      snapshot_iters: additional iteration counts at which to record the
        smoothed field ("field after k iterations", i.e. the field the
        reference would output with ``selected_niter=k``).
      sample_stride: OPT-IN speed knob (default 1 = the reference's dense
        data term).  Evaluate the SSD data term on the ``(::stride,)*3``
        sub-lattice of the coarse grid only: the per-index-bound
        neighbourhood gather — the measured Adam-loop floor (~10 ms/iter
        at 96³, core/warp.py) — shrinks by ``stride³`` while the smoother,
        regularizer and output field stay full-resolution (the data
        gradient is zero-padded onto the full grid, exactly the vjp of the
        strided slice; the box/Gaussian smoother vjp spreads it to the
        skipped points).  Precedent for sparse data terms in the reference:
        masked features (convex_adam_MIND.py:40-51) and masked cost volumes
        (l2r_2020_convexAdam_CuRIOUS.py:330-336).  Accuracy envelope pinned
        by tests + the on-chip measurement in ROADMAP.md.

    Returns:
      (final_field, snapshots): final smoothed field (3, h, w, d) — the
      smoothed field computed in the *last loop body before its update*,
      exactly the reference's output (``fitted_grid = disp_sample`` after the
      loop, convex_adam_MIND.py:181) — and a (S, 3, h, w, d) snapshot stack
      (S = len(snapshot_iters); the entry for ``k`` equals the field the
      reference would output with ``selected_niter=k``).
    """
    feat_fix = feat_fix.astype(jnp.float32)
    w0 = disp_init.astype(jnp.float32)
    smooth_fn = resolve_smoother(smoother)
    # corner stack: built once, loop-invariant (hoisted out of the scan) —
    # turns the 8 per-corner gathers per iteration into one tall-column
    # gather; kept in the caller's feature dtype (bf16 halves traffic)
    feat_mov_stack = build_corner_stack(feat_mov)
    feat_mov_shape = tuple(feat_mov.shape)

    opt = optax.adam(learning_rate=1.0, b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(w0)

    C = feat_mov_shape[0]
    feat_fix_sub = _sub_lattice(feat_fix, sample_stride)
    n_pts = int(
        feat_fix_sub.shape[1] * feat_fix_sub.shape[2] * feat_fix_sub.shape[3]
    )
    use_explicit = False
    if jax.default_backend() == "tpu":
        from convexadam_tpu.ops.warp_pallas import (  # noqa: PLC0415
            corner_reduce_supported,
        )

        use_explicit = corner_reduce_supported(n_pts)
    if use_explicit:
        fix_flat = feat_fix_sub.reshape(C, -1)

        def grad_fn(w):
            return _grad_step_explicit(
                w, fix_flat, feat_mov_stack, feat_mov_shape, lambda_weight,
                smooth_fn, cost_scale, stride=sample_stride,
            )
    else:
        def grad_fn(w):
            return _grad_step_autodiff(
                w, feat_fix_sub, feat_mov_stack, feat_mov_shape,
                lambda_weight, smooth_fn, cost_scale, stride=sample_stride,
            )

    n_snap = len(snapshot_iters)
    snaps0 = jnp.zeros((max(n_snap, 1),) + w0.shape, jnp.float32)
    # "after k iterations" == the smoothed field computed in loop body k-1
    snap_at = jnp.asarray(
        [s - 1 for s in snapshot_iters] if n_snap else [-1], jnp.int32
    )

    def step(carry, it):
        w, st, snaps, _ = carry
        ds, g = grad_fn(w)
        updates, st = opt.update(g, st, w)
        w_new = optax.apply_updates(w, updates)
        if n_snap:
            hit = (snap_at == it).astype(jnp.float32).reshape(-1, 1, 1, 1, 1)
            snaps = snaps * (1 - hit) + ds[None] * hit
        return (w_new, st, snaps, ds), None

    (_, _, snaps, final), _ = lax.scan(
        step, (w0, opt_state, snaps0, jnp.zeros_like(w0)), jnp.arange(niter)
    )
    return final, snaps[: max(n_snap, 1)]
