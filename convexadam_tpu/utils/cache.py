"""Persistent JAX compilation cache for the CLI entry points.

Remote TPU compiles cost 30 s – minutes per pipeline configuration; JAX's
persistent compilation cache is verified to work through the remote-compile
path (a second process re-running the same program gets a cache hit), so
every CLI enables it by default — sweep restarts, repeated registrations
and the infer stage skip recompilation entirely.

The library itself stays side-effect-free: only the ``cli/`` mains call
:func:`enable_compilation_cache`.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: "str | None" = None) -> "str | None":
    """Point JAX at a persistent on-disk compilation cache.

    Resolution order: explicit argument → ``CONVEXADAM_COMPILE_CACHE`` env
    var → ``~/.cache/convexadam_tpu/jax``.  Set
    ``CONVEXADAM_NO_COMPILE_CACHE=1`` to disable.  Returns the cache dir
    (or None when disabled).
    """
    if os.environ.get("CONVEXADAM_NO_COMPILE_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "CONVEXADAM_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "convexadam_tpu", "jax"
            ),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # don't bother persisting sub-second compiles
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
