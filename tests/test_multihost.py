"""Multi-host (DCN analogue) sweep fan-out: two OS processes, each with 4
virtual CPU devices, form one global (setting=2, pair=4) mesh over localhost
gRPC and run the stage-1 sweep as a single SPMD program — the TPU-native
replacement for the reference's process-per-GPU sweeps across hosts
(SURVEY.md §2.6; convex_run_withconfig.py:42-43)."""

import os
import pathlib
import socket
import subprocess
import sys

import numpy as np

from convexadam_tpu.selfconfig import Stage1Setting, run_stage1_sweep

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multihost_sweep_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_result():
    from convexadam_tpu.selfconfig import Stage2Setting, run_stage2_sweep

    rng = np.random.default_rng(0)
    segs = []
    for k in range(4):
        seg = np.zeros((24, 24, 24), np.int32)
        o = rng.integers(-2, 3, 3)
        seg[6 + o[0]: 18 + o[0], 6 + o[1]: 18 + o[1], 6 + o[2]: 18 + o[2]] = 1
        segs.append(seg)
    segs = np.stack(segs)
    settings = [
        Stage1Setting(nn_mult=10, grid_sp=3, disp_hw=1),
        Stage1Setting(nn_mult=5, grid_sp=3, disp_hw=1),
        Stage1Setting(nn_mult=10, grid_sp=4, disp_hw=2),
    ]
    res1 = run_stage1_sweep(
        segs, segs, [(0, 1), (1, 2), (2, 3)], settings, num_labels=1,
        compute_hd95=False,
    )
    res2 = run_stage2_sweep(
        segs, segs, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)], settings[0],
        [Stage2Setting(grid_sp_adam=2, avg_n=1, lambda_weight=1.0)],
        num_labels=1, compute_hd95=False,
    )
    return res1, res2


def test_two_process_sweep_matches_single_process(tmp_path):
    import jax
    import pytest

    if jax.default_backend() != "cpu":
        # the workers are pinned to JAX_PLATFORMS=cpu (no second TPU client
        # can attach to the single tunnelled chip), so on a TPU-backend
        # parent the bitwise comparison would be cross-backend; the DCN
        # path's numerics arm is covered by the CPU suite.
        pytest.skip("two-process DCN test compares CPU workers to a CPU run")
    coord = f"127.0.0.1:{_free_port()}"
    out = tmp_path / "mh_result.npz"
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(stdout.decode())
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o}"
    assert out.exists()

    got = np.load(out)
    ref, ref2 = _reference_result()
    np.testing.assert_allclose(got["dice"], ref.dice, atol=1e-6)
    np.testing.assert_allclose(got["jstd"], ref.jstd, atol=1e-6)
    assert int(got["best"]) == ref.best
    # stage 2 over DCN with 5 pairs on 4 pair shards (uneven) must match
    # the single-process run
    np.testing.assert_allclose(got["dice2"], ref2.dice, atol=1e-6)
    np.testing.assert_allclose(got["jstd2"], ref2.jstd, atol=1e-6)
    assert int(got["best2"]) == ref2.best
