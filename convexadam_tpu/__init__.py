"""convexadam_tpu — a TPU-native (JAX/XLA/Pallas) 3D medical image registration
framework with the capabilities of multimodallearning/convexAdam.

The framework implements the two-stage ConvexAdam registration method
(global discrete "coupled convex" optimisation + local continuous Adam
instance optimisation) re-designed for TPU hardware:

* all compute-path code is pure JAX (jit/vmap/shard_map-safe, static shapes),
* the SSD cost volume has a fused VMEM-resident Pallas kernel (auto-dispatch
  with XLA fallback) and the trilinear samplers carry TPU-tuned custom VJPs,
* the self-configuring hyperparameter search is vmapped over case pairs and
  sharded over TPU meshes instead of process-per-GPU sweeps,
* geometry-aware I/O (NIfTI/MetaImage, spacing/direction resampling) is a
  dependency-free pure-numpy subsystem.

Reference behaviour parity is documented per-function with file:line
citations into the reference repository.
"""

from convexadam_tpu.pipeline.convex_adam import (  # noqa: F401
    ConvexAdamConfig,
    convex_adam,
    convex_adam_jax,
    convex_adam_semantic_jax,
)
from convexadam_tpu.pipeline.apply import apply_convex, apply_convex_jax  # noqa: F401

__version__ = "0.1.0"
