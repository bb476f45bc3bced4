"""Deadline-bounded device-backend probe.

A wedged remote TPU plugin (e.g. the axon tunnel during an outage) blocks
PJRT client creation FOREVER while holding jax's global backend lock, so an
in-process timeout cannot recover — the only safe probe is a subprocess
with a deadline.  Shared by ``bench.py`` (fail fast instead of hanging the
driver) and ``__graft_entry__.dryrun_multichip`` (fall back to virtual CPU
devices).
"""

from __future__ import annotations

import subprocess
import sys


def probe_device_count(timeout_s: float = 90.0) -> int:
    """Number of devices the default jax backend would report, probed in a
    subprocess with a deadline.  Returns 0 on timeout or any failure (treat
    as "no usable devices"); the CALLING process never touches the backend.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        if r.returncode != 0:
            return 0
        return int(r.stdout.strip().splitlines()[-1])
    except Exception:
        return 0
