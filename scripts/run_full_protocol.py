"""The reference's FULL self-configuring protocol at reference scale, on
the chip, in one process (VERDICT r4 next#2).

Reference workload (README.md:32 "usually run in 1 hour or less" on GPU):
  stage 1: convex_run_withconfig.py — 100 seeded settings x 8 pairs at
           192x160x256 with Dice + robust30 + SDlogJ + HD95 per case
           (breadcrumb: 10:33, convexAdam_hyper_util.py:155-159)
  stage 2: adam_run_withconfig_shiftSpline.py — 75 seeded Adam settings,
           each ONE run per pair scored as 16 evaluation variants
           ({4 iters} x {4 smoothers}), ranked over the S x 16 grid.

This script runs both stages with OUR seeded samplers (torch-exact,
selfconfig/settings.py) on the bench fixture (organ-like labels at the
reference sweep shape) and records total minutes — the committed
full-protocol figure for BENCH/ROADMAP.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/run_full_protocol.py [--settings1 100] [--settings2 75]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings1", type=int, default=100)
    ap.add_argument("--settings2", type=int, default=75)
    ap.add_argument(
        "--checkpoint", default=None,
        help="directory for orbax sweep checkpoints (both stages); with "
        "--resume a crashed run continues, skipping completed batches "
        "(per-setting times stay honest; total minutes then span runs)",
    )
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import REF_PAIRS, make_sweep_fixture
    from convexadam_tpu.selfconfig.engine import (
        run_stage1_sweep,
        run_stage2_sweep,
    )
    from convexadam_tpu.selfconfig.settings import (
        stage1_settings,
        stage2_settings,
    )

    segs, L = make_sweep_fixture()
    pairs = list(REF_PAIRS)
    s1 = stage1_settings(args.settings1)
    s2 = stage2_settings(args.settings2)

    ck1 = ck2 = None
    if args.checkpoint:
        ck1 = args.checkpoint + "/stage1"
        ck2 = args.checkpoint + "/stage2"

    t0 = time.time()
    res1 = run_stage1_sweep(
        segs, segs, pairs, s1, num_labels=L, verbose=True,
        checkpoint_path=ck1, resume=args.resume,
    )
    t1 = time.time()
    best1 = s1[res1.best]
    print(
        json.dumps(
            {
                "stage": 1,
                "settings": len(s1),
                "minutes": round((t1 - t0) / 60, 2),
                "sec_per_setting_pair": round(
                    float(np.median(res1.times)) / len(pairs), 4
                ),
                "best": repr(best1),
                "rescored": res1.rescored,
            }
        ),
        flush=True,
    )

    res2 = run_stage2_sweep(
        segs, segs, pairs, best1, s2, num_labels=L, verbose=True,
        checkpoint_path=ck2, resume=args.resume,
    )
    t2 = time.time()
    print(
        json.dumps(
            {
                "stage": 2,
                "settings": len(s2),
                "variants": 16,
                "minutes": round((t2 - t1) / 60, 2),
                "sec_per_setting_pair": round(
                    float(np.median(res2.times)) / len(pairs), 4
                ),
                "best_flat_index": res2.best,
                "rescored": res2.rescored,
            }
        ),
        flush=True,
    )
    print(
        json.dumps(
            {
                "stage": "total",
                "minutes": round((t2 - t0) / 60, 2),
                "reference_minutes": 60.0,
                "speedup": round(60.0 / ((t2 - t0) / 60), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
