"""Summarize a run_full_protocol.py log: per-class setting counts/times and
the stage JSON lines — the table the ROADMAP/BENCH writeups cite.

Usage: python scripts/summarize_protocol_log.py /tmp/full_protocol_r5c.log
"""

import json
import re
import sys
from collections import defaultdict


def main(path):
    cls = defaultdict(list)
    stages = []
    pat = re.compile(
        r"^s=\d+ Stage1Setting\(nn_mult=[\d.]+, grid_sp=(\d+), "
        r"disp_hw=(\d+)\).* t=([\d.]+)s"
    )
    pat2 = re.compile(
        r"^s=\d+ .*grid_sp_adam=(\d+), avg_n=(\d+).* t=([\d.]+)s"
    )
    for line in open(path):
        m = pat.match(line) or pat2.match(line)
        if m:
            cls[(int(m.group(1)), int(m.group(2)))].append(float(m.group(3)))
        elif line.startswith("{"):
            try:
                stages.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    for key in sorted(cls):
        ts = sorted(cls[key])
        warm = ts[: max(1, len(ts) - 1)]  # drop the compile-bearing max
        print(
            f"class {key}: n={len(ts)} median_warm={warm[len(warm)//2]:.2f}s "
            f"max={ts[-1]:.2f}s total={sum(ts):.1f}s"
        )
    for s in stages:
        print(json.dumps(s))


if __name__ == "__main__":
    main(sys.argv[1])
