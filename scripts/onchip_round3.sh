#!/bin/bash
# One-shot on-chip validation + measurement for round 3 (run when the axon
# tunnel is back).  Each step is independently resumable; the compile cache
# makes repeats cheap.  NEVER run two TPU clients at once (see CLAUDE.md).
set -x
cd /root/repo

# 0. probe (bounded) — abort early if the tunnel is still wedged
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. full suite on the chip (catches TPU-only numerics; CLAUDE.md says CPU
#    tests cannot catch e.g. bf16-matmul precision loss)
CONVEXADAM_TEST_PLATFORM=axon timeout 5400 python -m pytest tests/ -q \
  2>&1 | tail -5

# 2. bench (both metrics: stage-1 sweep settings/s with the new HD95
#    engine, and the 192^3 headline pairs/s)
CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache timeout 3600 python bench.py

# 3. HD95 share of stage-1 sweep time: run bench_sweep with
#    CONVEXADAM_HD95_PALLAS=0 (XLA scan search) and compute_hd95 off for
#    comparison — see selfconfig/engine.py + ROADMAP "HD95 search engine
#    redesign" (round-2 profile: HD95 was ~80% of 2.31 s/setting).
#    Record numbers in ROADMAP.md + PARITY.md, then commit.
