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
2. Stage-2 sweep cost (s/(setting*pair), 16 evaluation variants each) vs
   the reference's <= 1 hour two-script claim minus its stage-1 breadcrumb
   (see bench_stage2).
3. The opt-in strided data term (adam_sample_stride=2, same accuracy
   guard): what the knob buys when dense reference semantics are not
   required.
4. Headline: one full L2R-scale case pair (192^3 voxels) through the
   complete MIND ConvexAdam pipeline at reference default hyperparameters
   (grid_sp=6, disp_hw=4, 80 Adam iterations, inverse consistency on,
   DENSE data term — the reference's exact workload) — the north-star
   target is < 1 s per case pair per chip (BASELINE.md), so
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


def make_sweep_fixture(
    H: int = 192, W: int = 160, D: int = 256, L: int = 13,
    n_vols: int = 10, seed: int = 1,
):
    """AbdomenCTCT-like sweep fixture: ``n_vols`` label volumes at the
    reference sweep's shape (192x160x256, convex_run_withconfig.py config)
    with ``L`` ORGAN-LIKE labels — compact blobs of mixed sizes inside a
    body region, background elsewhere (the round-3 fixture's Voronoi labels
    tiled the whole volume, giving every label an adversarially huge
    surface — fine as a stress test, wrong for a headline comparison
    against the reference's real-data breadcrumb; VERDICT r3 weak#6)."""
    from scipy.ndimage import zoom

    rng = np.random.default_rng(seed)
    ch, cw, cd = H // 4, W // 4, D // 4
    gz, gy, gx = np.meshgrid(
        np.arange(ch), np.arange(cw), np.arange(cd), indexing="ij"
    )
    # organ centres spread on a jittered grid inside the body, radii mixed
    # (livers to glands); argmax of (r_l^2 - d2_l) keeps organs disjoint
    centres = []
    for i in range(L):
        base = np.array(
            [
                ch * (0.3 + 0.4 * ((i * 5) % 7) / 6.0),
                cw * (0.25 + 0.5 * ((i * 3) % 5) / 4.0),
                cd * (0.2 + 0.6 * (i / max(L - 1, 1))),
            ]
        )
        centres.append(base + rng.uniform(-2, 2, 3))
    radii = rng.uniform(3.5, 11.0, L)
    score = np.full((ch, cw, cd), -1.0, np.float64)
    lab = np.zeros((ch, cw, cd), np.int32)
    for i, (c, r) in enumerate(zip(centres, radii), start=1):
        s = r * r - (
            (gz - c[0]) ** 2 + (gy - c[1]) ** 2 + (gx - c[2]) ** 2
        )
        take = s > score
        lab = np.where(take, i, lab)
        score = np.maximum(score, s)
    lab = np.where(score > 0, lab, 0)
    v = zoom(lab, (H / ch, W / cw, D / cd), order=0).astype(np.int32)
    segs = []
    for k in range(n_vols):
        sh = (int(rng.integers(-5, 6)), int(rng.integers(-5, 6)),
              int(rng.integers(-5, 6)))
        segs.append(np.roll(v, sh, axis=(0, 1, 2)))
    return np.stack(segs), L


# the reference's stage-1 breadcrumb: 100 settings x 8 pairs in 10:33 on GPU
# → 6.34 s/setting = 0.7925 s/(setting·pair)
# (convex_run_withconfig.py:51 pair tuple + convexAdam_hyper_util.py:155-159)
REF_SEC_PER_SETTING_PAIR = 6.34 / 8.0
REF_PAIRS = ((2, 4), (4, 9), (3, 4), (0, 4), (1, 4), (4, 7), (4, 5), (2, 8))


def bench_sweep():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from convexadam_tpu.selfconfig.engine import run_stage1_sweep
    from convexadam_tpu.selfconfig.settings import Stage1Setting

    segs, L = make_sweep_fixture()

    # four settings sharing one XLA shape key (nn_mult is traced) → one
    # compile serves the batch, like the production 100-setting sweep
    settings = [
        Stage1Setting(nn_mult=m, grid_sp=4, disp_hw=3)
        for m in (2.5, 5.0, 10.0, 15.0)
    ]
    pairs = list(REF_PAIRS)  # the reference config comment's 8 pairs
    # warmup/compile pass (one setting)
    run_stage1_sweep(segs, segs, pairs, settings[:1], num_labels=L)
    res = run_stage1_sweep(segs, segs, pairs, settings, num_labels=L)
    # marginal per-(setting·pair) cost (incl. metric eval + on-device HD95),
    # apples-to-apples with the reference's 8-pair breadcrumb — the one-time
    # host surface-count scan amortizes over the production 100-setting sweep
    dt = float(np.median(res.times)) / len(pairs)

    assert np.isfinite(res.dice).all() and np.isfinite(res.hd95).all()
    print(
        json.dumps(
            {
                "metric": "stage1_sweep_sec_per_setting_pair_192x160x256_8pairs",
                "value": round(dt, 4),
                "unit": "s/(setting*pair)",
                "vs_baseline": round(REF_SEC_PER_SETTING_PAIR / dt, 4),
            }
        ),
        flush=True,
    )


def bench_stage2():
    """Stage-2 (Adam shift-spline) sweep cost at the reference's protocol
    shape: each setting is ONE Adam run per pair whose snapshots are scored
    as 16 evaluation variants = {4 iteration counts} x {4 smoothers}, each
    variant paying Dice + SDlogJ + HD95
    (adam_run_withconfig_shiftSpline.py:159-263).  The reference publishes
    no stage-2-only number — its one wall-clock claim covers BOTH search
    scripts in <= 1 hour (README.md:32); subtracting the stage-1 breadcrumb
    (10:33, convexAdam_hyper_util.py:155-159) leaves <= 49.45 min for the
    75-setting x 8-pair stage-2 = 4.946 s/(setting*pair) as the baseline."""
    from convexadam_tpu.selfconfig.engine import run_stage2_sweep
    from convexadam_tpu.selfconfig.settings import Stage1Setting, Stage2Setting

    segs, L = make_sweep_fixture()
    convex_setting = Stage1Setting(nn_mult=10.0, grid_sp=4, disp_hw=3)
    # two settings sharing one (grid_sp_adam, avg_n) shape key
    # (lambda_weight is traced) — one compile serves the batch
    settings = [
        Stage2Setting(grid_sp_adam=2, avg_n=2, lambda_weight=lw)
        for lw in (0.75, 1.25)
    ]
    pairs = list(REF_PAIRS)
    run_stage2_sweep(  # warmup/compile (one setting)
        segs, segs, pairs, convex_setting, settings[:1], num_labels=L
    )
    res = run_stage2_sweep(
        segs, segs, pairs, convex_setting, settings, num_labels=L
    )
    dt = float(np.median(res.times)) / len(pairs)
    assert np.isfinite(res.dice).all() and np.isfinite(res.hd95).all()
    ref = (3600.0 - 633.0) / (75 * 8)
    print(
        json.dumps(
            {
                "metric": "stage2_sweep_sec_per_setting_pair_16variants",
                "value": round(dt, 4),
                "unit": "s/(setting*pair)",
                "vs_baseline": round(ref / dt, 4),
            }
        ),
        flush=True,
    )


def headline_fixture(shape=(192, 192, 192), shift=(5, -4, 3), seed=0):
    """The headline pair: smooth random texture + a known integer shift.

    Shared by bench.py and scripts/measure_strided_adam.py so the stride
    measurements committed to ROADMAP/docstrings use the bench's exact
    fixture and accuracy definition."""
    import jax.numpy as jnp

    from convexadam_tpu.core.warp import resize_trilinear

    rng = np.random.default_rng(seed)
    base = rng.standard_normal([s // 4 for s in shape]).astype(np.float32)
    vol = np.asarray(resize_trilinear(jnp.asarray(base)[None], shape)[0])
    vol = (vol - vol.mean()) / vol.std() * 100
    moving = np.roll(vol, shift, axis=(0, 1, 2))
    return jnp.asarray(vol), jnp.asarray(moving), np.array(shift, np.float32)


def time_headline_cfg(a, b, shift, cfg, n_runs: int = 5):
    """Time ``convex_adam_jax(a, b, cfg)`` and score shift recovery.

    Returns (pairs_per_sec, frac_within_1vox, mean_err_vox) — the bench's
    accuracy-guard definition (central crop, all-axes |err| < 1 voxel)."""
    import jax

    from convexadam_tpu.pipeline.convex_adam import convex_adam_jax

    fn = jax.jit(lambda x, y: convex_adam_jax(x, y, cfg))
    fn(a, b).block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn(a, b)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_runs
    d = np.asarray(out, dtype=np.float32)
    c = min(32, min(d.shape[:3]) // 4)  # central crop (32 at 192^3)
    err = np.abs(d[c:-c, c:-c, c:-c] - shift)
    frac_ok = float(np.mean(np.all(err < 1.0, axis=-1)))
    return 1.0 / dt, frac_ok, float(err.mean())


def main():
    from convexadam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # warm-up compile skipped on repeat runs

    from convexadam_tpu.pipeline.convex_adam import ConvexAdamConfig

    a, b, shift = headline_fixture()

    def run_cfg(cfg):
        pairs_per_sec, frac_ok, _ = time_headline_cfg(a, b, shift, cfg)
        # sanity: the synthetic shift must be recovered (guards against a
        # "fast but wrong" bench)
        assert frac_ok > 0.9, (
            f"accuracy regression: {frac_ok:.2%} within 1 voxel"
        )
        return pairs_per_sec

    # default dtype="auto" resolves to bfloat16 on TPU (the production
    # precision policy — tests pin its accuracy envelope vs f32)
    import dataclasses

    strided = run_cfg(
        dataclasses.replace(ConvexAdamConfig(), adam_sample_stride=2)
    )
    print(
        json.dumps(
            {
                "metric": "l2r_case_pairs_per_sec_per_chip_192cube_stride2",
                "value": round(strided, 4),
                "unit": "pairs/s",
                "vs_baseline": round(strided / 1.0, 4),
            }
        ),
        flush=True,
    )
    pairs_per_sec = run_cfg(ConvexAdamConfig())
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
    bench_stage2()
    main()
