"""Multi-host (DCN) fan-out for the self-configuring sweeps.

The reference's only multi-accelerator story is one sweep process per GPU
(`CUDA_VISIBLE_DEVICES=argv[1]`, convex_run_withconfig.py:42-43).  The
TPU-native equivalent within one slice is the (setting, pair) ICI mesh
(parallel/batch.py); ACROSS hosts/slices the same SPMD program spans the
global device set via ``jax.distributed`` — every process runs the same
sweep script, the mesh covers all processes' devices, XLA routes
inter-slice collectives over DCN, and metric outputs come back replicated
so every host sees the full result (no files-and-argv hand-off).

Usage (same script on every host):

    from convexadam_tpu.parallel import distributed, batch
    distributed.init_distributed()          # env-driven, no-op single-host
    mesh = batch.make_sweep_mesh()          # spans ALL processes' devices
    res = run_stage1_sweep(..., mesh=mesh)  # identical metrics on all hosts

The engine handles the two multi-process mechanics internally: host numpy
inputs become global arrays via ``jax.make_array_from_callback`` (every
host loads the full dataset, contributes its addressable shards) and
output shardings switch to fully-replicated.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-host sweeps.

    With no arguments, cluster parameters come from the environment (TPU
    pod metadata or ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``).  Returns True if a multi-process runtime was
    initialized, False for the single-process no-op.
    """
    if num_processes == 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except ValueError:
        # single-process environment with no cluster config
        return False
    return jax.process_count() > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def make_global(arr: np.ndarray, sharding) -> jax.Array:
    """Host-replicated numpy → global sharded array.

    Every process holds the full ``arr`` (all hosts load the whole dataset,
    as the reference's per-GPU processes do) and contributes the shards it
    addresses.  Single-process: returns ``arr`` unchanged (jit shards it).
    """
    if sharding is None or not is_multiprocess():
        return arr
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )
