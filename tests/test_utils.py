"""Profiling / memory utility tests (reference gpu_usage + timing parity,
convex_adam_utils.py:138-139, convex_adam_nnUNet.py:57-58)."""

import numpy as np

import jax.numpy as jnp

from convexadam_tpu.utils.memory import (
    device_usage,
    profile_trace,
    stage_timer,
)


def test_device_usage_reports():
    _ = jnp.zeros((64, 64)) + 1  # touch the backend
    s = device_usage()
    assert "device usage" in s and "GB" in s


def test_stage_timer_accumulates():
    timings: dict = {}
    with stage_timer("stage_a", timings):
        np.zeros(10)
    with stage_timer("stage_a", timings):
        np.zeros(10)
    assert timings["stage_a"] >= 0.0
    assert len(timings) == 1


def test_profile_trace_writes_trace(tmp_path):
    with profile_trace(tmp_path):
        jnp.sum(jnp.ones((128, 128))).block_until_ready()
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax

    from convexadam_tpu.utils.cache import enable_compilation_cache

    d = enable_compilation_cache(str(tmp_path / "jcache"))
    assert d and (tmp_path / "jcache").is_dir()
    assert jax.config.jax_compilation_cache_dir == d
    monkeypatch.setenv("CONVEXADAM_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache() is None
