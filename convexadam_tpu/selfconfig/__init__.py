"""Self-configuring hyperparameter optimisation (reference L3,
self_configuring/): two-stage random search scored by multi-metric rank
aggregation, re-designed as vmapped/sharded TPU sweeps instead of
process-per-GPU loops.
"""

from convexadam_tpu.selfconfig.settings import (  # noqa: F401
    Stage1Setting,
    Stage1PairedSetting,
    Stage2Setting,
    stage1_settings,
    stage1_paired_settings,
    stage2_settings,
    decode_adam_variant,
)
from convexadam_tpu.selfconfig.engine import (  # noqa: F401
    run_stage1_sweep,
    run_stage2_sweep,
)
