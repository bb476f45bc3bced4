"""Headline benchmark: full-resolution registration throughput on one chip.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"}; the LAST line
is the headline metric (the driver parses the final line).

1. Stage-1 sweep throughput (settings/s): a small semantic stage-1 sweep
   (4 settings x 2 pairs at 160x192x160, 13 labels, Dice + robust30 +
   SDlogJ + on-device HD95) — the self-configuring search is the
   reference's throughput-critical workload; its only published number is
   ~6.34 s per setting-iteration on GPU
   (self_configuring/convexAdam_hyper_util.py:155-159), so
   vs_baseline = 6.34 / seconds_per_setting.
2. Headline: one full L2R-scale case pair (192^3 voxels) through the
   complete MIND ConvexAdam pipeline at reference default hyperparameters
   (grid_sp=6, disp_hw=4, 80 Adam iterations, inverse consistency on) —
   the north-star target is < 1 s per case pair per chip (BASELINE.md), so
   vs_baseline = pairs_per_sec / 1.0.
"""

import json
import sys
import time

import numpy as np


def _device_probe_or_die(timeout_s: float = 180.0) -> None:
    """Fail fast instead of hanging when the TPU plugin's tunnel is wedged:
    backend init blocks forever inside PJRT client creation (and holds
    jax's global backend lock), so probe in a subprocess with a deadline
    (utils/devices.py) before this process touches the backend."""
    from convexadam_tpu.utils.devices import probe_device_count

    if probe_device_count(timeout_s) <= 0:
        print(
            "bench: device backend failed to initialize within "
            f"{timeout_s:.0f}s (TPU tunnel down?) — aborting instead of "
            "hanging",
            file=sys.stderr,
        )
        raise SystemExit(1)


def bench_sweep():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from convexadam_tpu.selfconfig.engine import run_stage1_sweep
    from convexadam_tpu.selfconfig.settings import Stage1Setting

    from scipy.ndimage import zoom

    rng = np.random.default_rng(1)
    H, W, D, L = 160, 192, 160, 13
    # organ-like labels: one compact Voronoi region per label inside a body
    # mask (scattered-speckle labels would give every label an
    # unrealistically huge surface and distort the HD95 share)
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
    coarse = np.argmin(d2, axis=0).astype(np.int32)  # labels 0..L
    segs = []
    for k in range(3):
        lab = zoom(coarse, (H / ch, W / cw, D / cd), order=0).astype(np.int32)
        segs.append(np.roll(lab, (3 * k, -2 * k, k), axis=(0, 1, 2)))
    segs = np.stack(segs)

    # four settings sharing one XLA shape key (nn_mult is traced) → one
    # compile serves the batch, like the production 100-setting sweep
    settings = [
        Stage1Setting(nn_mult=m, grid_sp=4, disp_hw=3)
        for m in (2.5, 5.0, 10.0, 15.0)
    ]
    pairs = [(0, 1), (1, 2)]
    # warmup/compile pass (one setting)
    run_stage1_sweep(segs, segs, pairs, settings[:1], num_labels=L)
    res = run_stage1_sweep(segs, segs, pairs, settings, num_labels=L)
    # marginal per-setting cost (incl. metric eval + on-device HD95), like
    # the reference's per-iteration print — the one-time host surface-count
    # scan amortizes over the production 100-setting sweep
    dt = float(np.median(res.times))

    assert np.isfinite(res.dice).all() and np.isfinite(res.hd95).all()
    settings_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "stage1_sweep_settings_per_sec_160x192x160_2pairs",
                "value": round(settings_per_sec, 4),
                "unit": "settings/s",
                "vs_baseline": round(6.34 / dt, 4),
            }
        ),
        flush=True,
    )


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
    _device_probe_or_die()
    bench_sweep()
    main()
