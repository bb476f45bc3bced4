"""Device memory reporting (the reference's ``gpu_usage`` analogue,
convex_adam_utils.py:138-139) plus simple stage timers."""

from __future__ import annotations

import contextlib
import time


def device_usage(device=None) -> str:
    """Current / peak device memory as a human-readable string."""
    import jax

    if device is None:
        device = jax.devices()[0]
    try:
        stats = device.memory_stats()
        cur = stats.get("bytes_in_use", 0) * 1e-9
        peak = stats.get("peak_bytes_in_use", 0) * 1e-9
        return f"device usage (current/peak): {cur:.2f} / {peak:.2f} GB"
    except Exception:
        live = sum(
            x.nbytes for x in jax.live_arrays() if device in getattr(x, "devices", lambda: set())()
        )
        return f"device usage (live arrays): {live * 1e-9:.2f} GB"


@contextlib.contextmanager
def profile_trace(log_dir):
    """Capture a ``jax.profiler`` device trace around a block.

    The TPU analogue of the reference's cuda-synchronize wall-clock
    bracketing (SURVEY §5): writes a TensorBoard/XProf-viewable trace of
    every XLA kernel under ``log_dir``.  Use around one registration or one
    sweep setting; traces of long sweeps get large.
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stage_timer(name: str, timings: dict | None = None, verbose: bool = False):
    """Wall-clock a pipeline stage (the reference brackets stages with
    cuda.synchronize + time.time, convex_adam_nnUNet.py:57-58,146-149);
    callers should block on results inside the context for accuracy."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if timings is not None:
        timings[name] = timings.get(name, 0.0) + dt
    if verbose:
        print(f"{name}: {dt:.3f}s")
