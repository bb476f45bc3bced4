"""Headline benchmark: full-resolution registration throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: one full L2R-scale case pair (192^3 voxels) through the complete
MIND ConvexAdam pipeline at reference default hyperparameters
(grid_sp=6, disp_hw=4, 80 Adam iterations, inverse consistency on) — the
reference's north-star target is < 1 s per case pair per chip
(BASELINE.md), so vs_baseline = pairs_per_sec / 1.0.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # warm-up compile skipped on repeat runs

    from convexadam_tpu.core.warp import resize_trilinear
    from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig, convex_adam_jax

    shape = (192, 192, 192)
    rng = np.random.default_rng(0)
    base = rng.standard_normal([s // 4 for s in shape]).astype(np.float32)
    vol = np.asarray(resize_trilinear(jnp.asarray(base)[None], shape)[0])
    vol = (vol - vol.mean()) / vol.std() * 100
    moving = np.roll(vol, (5, -4, 3), axis=(0, 1, 2))

    # default dtype="auto" resolves to bfloat16 on TPU (the production
    # precision policy — tests pin its accuracy envelope vs f32)
    cfg = ConvexAdamConfig()
    fn = jax.jit(lambda a, b: convex_adam_jax(a, b, cfg))

    a = jnp.asarray(vol)
    b = jnp.asarray(moving)
    fn(a, b).block_until_ready()  # compile + warmup

    n_runs = 5
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn(a, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_runs

    # sanity: the synthetic shift must be recovered (guards against a "fast
    # but wrong" bench)
    d = np.asarray(out, dtype=np.float32)
    c = 32
    err = np.abs(d[c:-c, c:-c, c:-c] - np.array([5, -4, 3], np.float32))
    frac_ok = float(np.mean(np.all(err < 1.0, axis=-1)))
    assert frac_ok > 0.9, f"accuracy regression: {frac_ok:.2%} within 1 voxel"

    pairs_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "l2r_case_pairs_per_sec_per_chip_192cube",
                "value": round(pairs_per_sec, 4),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / 1.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
