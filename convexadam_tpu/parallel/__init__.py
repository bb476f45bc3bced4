"""Multi-chip scaling: device meshes and sharded batch registration.

The reference scales by launching one process per GPU
(CUDA_VISIBLE_DEVICES, reference self_configuring/convex_run_withconfig.py:42-43);
here a single program shards work over a ``jax.sharding.Mesh`` and XLA/GSPMD
inserts the collectives.
"""

from convexadam_tpu.parallel.batch import (  # noqa: F401
    make_mesh,
    register_pairs_batched,
    register_pairs_sharded,
)
