"""Measure the HD95 engine's share of stage-1 sweep time on the real chip.

Round-2 profile: HD95 was ~80% of setting cost (~1.85 s of 2.31 s/setting
at bench shapes) with the host-EDT loop / first-cut device search.  Round 3
redesigned the device engine (see ROADMAP "HD95 search engine redesign");
this script produces the promised measurement:

  1. compute_hd95=False            — the sweep floor (register + Dice/SDlogJ)
  2. device HD95, Pallas kernels   — the production TPU path
  3. device HD95, XLA-scan search  — CONVEXADAM_HD95_PALLAS=0 kill switch

Run each mode in a SEPARATE process (the kill switch is read at import/trace
time and compiled programs are cached per process):

    for m in off pallas xla; do
      PYTHONPATH=/root/repo:/root/.axon_site \
      CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
      python scripts/measure_hd95_share.py $m
    done

Prints one JSON line per run: {"mode", "sec_per_setting"}.
"""

import json
import os
import sys

import numpy as np


def make_fixture():
    # the round-3 Voronoi STRESS fixture (labels tile the whole volume —
    # per-label surfaces 17k-37k points, adversarial for HD95).  bench.py's
    # sweep metric moved to an organ-like sparse fixture at the reference
    # shape (bench.make_sweep_fixture, round 4); this one is kept for the
    # HD95-engine profiling scripts so their numbers stay comparable
    # across rounds.
    from scipy.ndimage import zoom

    rng = np.random.default_rng(1)
    H, W, D, L = 160, 192, 160, 13
    ch, cw, cd = 40, 48, 40
    gz, gy, gx = np.meshgrid(
        np.arange(ch), np.arange(cw), np.arange(cd), indexing="ij"
    )
    seeds = np.stack(
        [rng.uniform(6, s - 6, L + 1) for s in (ch, cw, cd)], axis=1
    )
    d2 = (
        (gz[None] - seeds[:, 0, None, None, None]) ** 2
        + (gy[None] - seeds[:, 1, None, None, None]) ** 2
        + (gx[None] - seeds[:, 2, None, None, None]) ** 2
    )
    coarse = np.argmin(d2, axis=0).astype(np.int32)
    segs = []
    for k in range(3):
        lab = zoom(coarse, (H / ch, W / cw, D / cd), order=0).astype(np.int32)
        segs.append(np.roll(lab, (3 * k, -2 * k, k), axis=(0, 1, 2)))
    return np.stack(segs), L


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    assert mode in ("off", "pallas", "xla"), mode
    if mode == "xla":
        os.environ["CONVEXADAM_HD95_PALLAS"] = "0"

    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from convexadam_tpu.selfconfig.engine import run_stage1_sweep
    from convexadam_tpu.selfconfig.settings import Stage1Setting

    segs, L = make_fixture()
    settings = [
        Stage1Setting(nn_mult=m, grid_sp=4, disp_hw=3)
        for m in (2.5, 5.0, 10.0, 15.0)
    ]
    pairs = [(0, 1), (1, 2)]
    kw = dict(num_labels=L)
    if mode == "off":
        kw["compute_hd95"] = False
    else:
        kw["hd95_mode"] = "device"
    run_stage1_sweep(segs, segs, pairs, settings[:1], **kw)  # compile
    res = run_stage1_sweep(segs, segs, pairs, settings, **kw)
    print(json.dumps({
        "mode": mode,
        "sec_per_setting": round(float(np.median(res.times)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
