"""Worker for the multi-host sweep test: one of N processes contributing 4
CPU devices to a global (setting, pair) mesh and running a tiny stage-1
sweep.  Launched by tests/test_multihost.py; writes metrics (process 0)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, nproc, pid, out_path = sys.argv[1:5]
    from convexadam_tpu.parallel.distributed import init_distributed

    ok = init_distributed(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert ok, "distributed init failed"
    assert jax.process_count() == int(nproc)
    assert len(jax.devices()) == 4 * int(nproc), jax.devices()

    from convexadam_tpu.parallel.batch import make_sweep_mesh
    from convexadam_tpu.selfconfig import Stage1Setting, run_stage1_sweep

    mesh = make_sweep_mesh(n_setting=2, n_pair=2 * int(nproc))

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
    res = run_stage1_sweep(
        segs, segs, [(0, 1), (1, 2), (2, 3)], settings, num_labels=1,
        compute_hd95=False, mesh=mesh, setting_batch=2,
    )

    # stage 2 across the same DCN mesh, with a pair count (5) that does NOT
    # divide the 4 pair shards and a single Adam setting padded up to the
    # setting_batch — the uneven-shard paths end to end
    from convexadam_tpu.selfconfig import Stage2Setting, run_stage2_sweep

    pairs5 = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    res2 = run_stage2_sweep(
        segs, segs, pairs5, settings[0],
        [Stage2Setting(grid_sp_adam=2, avg_n=1, lambda_weight=1.0)],
        num_labels=1, compute_hd95=False, mesh=mesh, setting_batch=2,
    )
    if int(pid) == 0:
        np.savez(
            out_path, dice=res.dice, jstd=res.jstd, best=res.best,
            dice2=res2.dice, jstd2=res2.jstd, best2=res2.best,
        )
    jax.effects_barrier()


if __name__ == "__main__":
    main()
