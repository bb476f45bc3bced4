"""HD95 share of the stage-1 sweep at the ROUND-4 bench fixture.

Round 3 measured the share on the Voronoi stress fixture
(scripts/measure_hd95_share.py: 2.29 of 2.55 s/setting, ~90%).  This
script measures it at the fixture the headline is actually reported on —
bench.make_sweep_fixture: 192x160x256, 13 organ-like sparse labels, the
reference's 8 pairs — by running the same sweep with compute_hd95=False
(registration + Dice/SDlogJ floor) and with the on-device HD95 engine.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/measure_sweep_share_r4.py

Prints one JSON line per mode: {"mode", "sec_per_setting_pair"}.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import REF_PAIRS, make_sweep_fixture
    from convexadam_tpu.selfconfig.engine import run_stage1_sweep
    from convexadam_tpu.selfconfig.settings import Stage1Setting

    segs, L = make_sweep_fixture()
    settings = [
        Stage1Setting(nn_mult=m, grid_sp=4, disp_hw=3)
        for m in (2.5, 5.0, 10.0, 15.0)
    ]
    pairs = list(REF_PAIRS)

    for mode, kw in (
        ("floor_no_hd95", dict(compute_hd95=False)),
        ("device_hd95", dict(hd95_mode="device")),
    ):
        # warmup/compile (one setting), then the timed 4-setting batch
        run_stage1_sweep(segs, segs, pairs, settings[:1], num_labels=L, **kw)
        res = run_stage1_sweep(segs, segs, pairs, settings, num_labels=L, **kw)
        dt = float(np.median(res.times)) / len(pairs)
        print(
            json.dumps(
                {"mode": mode, "sec_per_setting_pair": round(dt, 4)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
