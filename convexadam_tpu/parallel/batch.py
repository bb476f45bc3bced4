"""Sharded batch registration over a TPU mesh.

Parallelism map (vs the reference's none — see SURVEY.md §2.6):

* **DP over case pairs** — the registration pipeline is vmapped over a batch
  of (fixed, moving) pairs and the batch axis is sharded over the ``pair``
  mesh axis.  This is the throughput axis for the self-configuring sweeps
  (settings x pairs are embarrassingly parallel).
* **Spatial sharding (SP analogue)** — volumes can additionally be sharded
  along their leading spatial axis over the ``space`` mesh axis; GSPMD
  inserts halo exchanges for the stencil ops (box filters, shifted slices)
  and keeps the cost volume distributed.  Useful when a volume (or the
  ``(2q+1)^3`` cost volume) exceeds one chip's HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam_jax


def make_mesh(
    n_pair: Optional[int] = None, n_space: int = 1, devices=None
) -> Mesh:
    """Create a (pair, space) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_pair is None:
        n_pair = len(devices) // n_space
    grid = mesh_utils.create_device_mesh((n_pair, n_space), devices=devices[: n_pair * n_space])
    return Mesh(grid, ("pair", "space"))


def make_sweep_mesh(
    n_setting: Optional[int] = None,
    n_pair: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Create a (setting, pair) mesh for self-configuring sweep fan-out.

    This is the TPU-native replacement for the reference's process-per-GPU
    sweep parallelism (`CUDA_VISIBLE_DEVICES=argv[1]`,
    convex_run_withconfig.py:42-43): hyperparameter settings shard over the
    ``setting`` axis and case pairs over the ``pair`` axis of one SPMD
    program, with metric reductions staying on-device.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_setting is None and n_pair is None:
        n_setting = 2 if (n % 2 == 0 and n > 1) else 1
    if n_pair is None:
        n_pair = n // n_setting
    if n_setting is None:
        n_setting = n // n_pair
    grid = mesh_utils.create_device_mesh(
        (n_setting, n_pair), devices=devices[: n_setting * n_pair]
    )
    return Mesh(grid, ("setting", "pair"))


@functools.partial(jax.jit, static_argnames=("cfg",))
def register_pairs_batched(
    fixed: jax.Array, moving: jax.Array, cfg: ConvexAdamConfig
) -> jax.Array:
    """vmap the full MIND pipeline over a batch: (B, H, W, D) x2 → (B, H, W, D, 3)."""
    return jax.vmap(lambda f, m: convex_adam_jax(f, m, cfg))(fixed, moving)


def register_pairs_sharded(
    fixed: np.ndarray,
    moving: np.ndarray,
    cfg: ConvexAdamConfig,
    mesh: Mesh,
    shard_space: bool = False,
) -> jax.Array:
    """Register a batch of pairs sharded over ``mesh``.

    The batch axis is sharded over the ``pair`` mesh axis; with
    ``shard_space=True`` the leading spatial axis is additionally sharded over
    the ``space`` axis (GSPMD spatial partitioning).
    """
    sharding = NamedSharding(mesh, P("pair", "space" if shard_space else None))
    fixed_s = jax.device_put(jnp.asarray(fixed), sharding)
    moving_s = jax.device_put(jnp.asarray(moving), sharding)
    return _sharded_register_fn(mesh, cfg, shard_space)(fixed_s, moving_s)


@functools.lru_cache(maxsize=16)
def _sharded_register_fn(mesh: Mesh, cfg: ConvexAdamConfig, shard_space: bool):
    """Memoised jitted program for :func:`register_pairs_sharded` (Mesh and
    the frozen config are hashable) — a fresh jax.jit object per call has an
    empty dispatch cache, re-tracing and re-querying the slow remote
    compile path on every batch (cf. core/convex.py:_tp_convex_fn)."""
    sharding = NamedSharding(mesh, P("pair", "space" if shard_space else None))
    return jax.jit(
        jax.vmap(lambda f, m: convex_adam_jax(f, m, cfg)),
        in_shardings=(sharding, sharding),
        out_shardings=sharding,
    )
