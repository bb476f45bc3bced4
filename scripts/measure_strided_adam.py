"""On-chip measurement of the opt-in Adam data-term sample stride
(VERDICT r4 next#3): headline pairs/s at 192³ reference defaults and the
shift-recovery accuracy for stride 1 (dense, the default) vs 2 and 3.

The dense Adam loop is gather-floor bound (~10 ms/iter at 96³,
core/warp.py); stride s cuts the per-index cost by s³.  This script
records what that buys end-to-end and what it costs in accuracy —
the numbers the ROADMAP/config docstrings cite.

Run:
    PYTHONPATH=/root/repo:/root/.axon_site \
    CONVEXADAM_COMPILE_CACHE=/tmp/jaxcache \
    python scripts/measure_strided_adam.py
"""

import dataclasses
import json
import time

import numpy as np


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from convexadam_tpu.core.warp import resize_trilinear
    from convexadam_tpu.pipeline.convex_adam import (
        ConvexAdamConfig,
        convex_adam_jax,
    )

    shape = (192, 192, 192)
    rng = np.random.default_rng(0)
    base = rng.standard_normal([s // 4 for s in shape]).astype(np.float32)
    vol = np.asarray(resize_trilinear(jnp.asarray(base)[None], shape)[0])
    vol = (vol - vol.mean()) / vol.std() * 100
    moving = np.roll(vol, (5, -4, 3), axis=(0, 1, 2))
    a, b = jnp.asarray(vol), jnp.asarray(moving)

    for stride in (1, 2, 3):
        cfg = dataclasses.replace(ConvexAdamConfig(), adam_sample_stride=stride)
        fn = jax.jit(lambda x, y, c=cfg: convex_adam_jax(x, y, c))
        fn(a, b).block_until_ready()
        n_runs = 5
        t0 = time.perf_counter()
        for _ in range(n_runs):
            out = fn(a, b)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n_runs
        d = np.asarray(out, dtype=np.float32)
        c = 32
        err = np.abs(d[c:-c, c:-c, c:-c] - np.array([5, -4, 3], np.float32))
        frac_ok = float(np.mean(np.all(err < 1.0, axis=-1)))
        print(
            json.dumps(
                {
                    "stride": stride,
                    "pairs_per_sec": round(1.0 / dt, 4),
                    "frac_within_1vox": round(frac_ok, 4),
                    "mean_err_vox": round(float(err.mean()), 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
