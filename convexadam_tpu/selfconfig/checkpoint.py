"""Sweep-state checkpoint/resume.

The reference checkpoints sweep metrics with ``torch.save`` after every
setting so a crashed search loses at most one setting
(convex_run_withconfig.py:156, adam_run_withconfig_shiftSpline.py:265-266)
but has no resume logic — a restart recomputes everything.  Here the state
(metric arrays + the set of completed setting indices) is written
atomically through orbax after every setting batch, and the sweep engines
skip completed batches on resume.

Falls back to ``.npz`` files when orbax is unavailable (non-atomic, same
contract).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Optional

import numpy as np


class SweepCheckpointer:
    """Atomic checkpointing of sweep metric state keyed by a base path.

    ``save(state)`` / ``restore() -> state | None`` where ``state`` is a
    flat dict of numpy arrays (must contain ``completed``: the sorted
    indices of fully-evaluated settings).
    """

    def __init__(self, path):
        self.base = Path(str(path))
        try:
            import orbax.checkpoint as ocp  # noqa: PLC0415

            self._ocp = ocp
        except ImportError:  # pragma: no cover - orbax is a baked-in dep
            self._ocp = None

    @property
    def _dir(self) -> Path:
        return self.base.with_suffix(self.base.suffix + ".ckpt")

    @property
    def _npz(self) -> Path:
        # distinct from the sweep CLI's final results npz, which is saved
        # to the base path itself — sharing it would clobber the fallback
        # checkpoint with a schema lacking "completed" and kill resume
        return self.base.with_suffix(self.base.suffix + ".ckpt.npz")

    def save(self, state: dict) -> None:
        state = {k: np.asarray(v) for k, v in state.items()}
        if self._ocp is None:
            np.savez(self._npz, **state)
            return
        ckpt = self._ocp.PyTreeCheckpointer()
        ckpt.save(self._dir.resolve(), state, force=True)

    def restore(self) -> Optional[dict]:
        if self._ocp is not None and self._dir.exists():
            ckpt = self._ocp.PyTreeCheckpointer()
            out = ckpt.restore(self._dir.resolve())
            return {k: np.asarray(v) for k, v in out.items()}
        if self._npz.exists():
            with np.load(self._npz) as f:
                return {k: f[k] for k in f.files}
        return None

    def clear(self) -> None:
        if self._dir.exists():
            shutil.rmtree(self._dir)
        if self._npz.exists():
            self._npz.unlink()
