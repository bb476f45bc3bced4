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
