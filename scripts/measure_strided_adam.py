"""On-chip measurement of the opt-in Adam data-term sample stride
(VERDICT r4 next#3): headline pairs/s at 192³ reference defaults and the
shift-recovery accuracy for stride 1 (dense, the default) vs 2 and 3.

The dense Adam loop is gather-floor bound (~10 ms/iter at 96³,
core/warp.py); stride s cuts the per-index cost by s³.  This script
records what that buys end-to-end and what it costs in accuracy —
the numbers the ROADMAP/config docstrings cite.  Fixture, timing loop
and accuracy definition are bench.py's own helpers (headline_fixture /
time_headline_cfg), so these numbers cannot drift from the bench's.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/measure_strided_adam.py
"""

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import headline_fixture, time_headline_cfg
    from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig

    a, b, shift = headline_fixture()
    for stride in (1, 2, 3):
        cfg = dataclasses.replace(ConvexAdamConfig(), adam_sample_stride=stride)
        pps, frac_ok, mean_err = time_headline_cfg(a, b, shift, cfg)
        print(
            json.dumps(
                {
                    "stride": stride,
                    "pairs_per_sec": round(pps, 4),
                    "frac_within_1vox": round(frac_ok, 4),
                    "mean_err_vox": round(mean_err, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
