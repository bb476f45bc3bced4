#!/bin/bash
# One-shot on-chip validation + measurement to CLOSE round 4 (VERDICT r3
# next#5: every round must end with the full suite on the chip — CPU tests
# cannot catch TPU-only numerics like bf16-matmul precision loss).
# Each step is independently resumable; the persistent compile cache makes
# repeats cheap.  NEVER run two TPU clients at once (CLAUDE.md).
set -x -o pipefail
cd /root/repo

# 0. probe (bounded) — abort early if the tunnel is wedged
timeout 180 python -c "import jax; print(jax.devices())" || exit 1

# 1. full suite on the chip — a red suite must abort the round close
CONVEXADAM_TEST_PLATFORM=axon timeout 7200 python -m pytest tests/ -q \
  2>&1 | tail -5 || { echo "ON-CHIP SUITE FAILED"; exit 1; }

# 2. bench (headline pairs/s at 192^3 + the 8-pair sweep s/(setting*pair))
CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache timeout 3600 python bench.py

# 3. CuRIOUS on real landmark geometry (new this round) — record TREs
CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache timeout 1800 python scripts/curious_onchip.py

# Record suite pass counts + bench numbers in ROADMAP.md, then commit.
