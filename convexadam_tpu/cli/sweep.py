"""CLI: self-configuring hyperparameter sweeps with the reference's JSON
config contract.

Mirrors convex_run_withconfig.py / adam_run_withconfig_shiftSpline.py /
infer_convexadam.py CLIs.  Config keys (convex_run_withconfig.py:46-58):
``topk`` (case ids), ``topk_pair`` (index pairs), ``HWD`` (volume shape),
``f_predict`` / ``f_gt`` (printf-style paths of predicted / GT label
volumes), ``num_labels``, ``output`` (metrics file).

Differences from the reference: no per-GPU process fan-out (the pair axis is
vmapped/sharded on device) and metrics checkpoints are .npz instead of
torch.save.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _load_data(config):
    from convexadam_tpu.geometry.io import load_volume_nib_order

    topk = config["topk"]
    H, W, D = config["HWD"]
    preds, segs = [], []
    for k in topk:
        p, _ = load_volume_nib_order(config["f_predict"] % k)
        g, _ = load_volume_nib_order(config["f_gt"] % k)
        preds.append(np.asarray(p[:H, :W, :D], np.int32))
        segs.append(np.asarray(g[:H, :W, :D], np.int32))
    return np.stack(preds), np.stack(segs)


def main(argv=None):
    from convexadam_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="self-configuring sweeps")
    parser.add_argument("stage", choices=["convex", "adam", "infer"])
    parser.add_argument("configfile")
    parser.add_argument("--convex_s", type=int, default=None,
                        help="chosen stage-1 setting index (stages adam/infer)")
    parser.add_argument("--adam_s1", type=int, default=None)
    parser.add_argument("--adam_s2", type=int, default=None)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument(
        "--mesh", action="store_true",
        help="fan the sweep out over all devices on a (setting, pair) mesh",
    )
    parser.add_argument(
        "--setting_batch", type=int, default=None,
        help="settings per vmapped batch (default: #setting-shards)",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from the sweep-state checkpoint (skips completed settings)",
    )
    args = parser.parse_args(argv)

    with open(args.configfile) as f:
        config = json.load(f)

    from convexadam_tpu.selfconfig import (
        decode_adam_variant,
        run_stage1_sweep,
        run_stage2_sweep,
        stage1_settings,
        stage2_settings,
    )

    num_labels = config["num_labels"] - 1
    pairs = [tuple(p) for p in config["topk_pair"]]
    preds, segs = _load_data(config)

    mesh = None
    if args.mesh:
        from convexadam_tpu.parallel.batch import make_sweep_mesh

        mesh = make_sweep_mesh()

    if args.stage == "convex":
        settings = stage1_settings()
        res = run_stage1_sweep(
            preds, segs, pairs, settings, num_labels, verbose=args.verbose,
            checkpoint_path=config["output"],
            mesh=mesh, setting_batch=args.setting_batch, resume=args.resume,
        )
        np.savez(
            config["output"],
            dice=res.dice, jstd=res.jstd, hd95=res.hd95, times=res.times,
            rank=res.rank,
        )
        print(f"best convex setting: s={res.best} {settings[res.best]}")
        print(
            f"dice {res.dice[res.best,0]:.4f}/{res.dice[res.best,1]:.4f} "
            f"jstd {res.jstd[res.best,0]:.4f}"
        )
        # the console-script wrapper sys.exit()s this return value — the
        # best INDEX must not become a failure exit code (it is printed and
        # saved in the results npz instead)
        return 0

    if args.stage == "adam":
        assert args.convex_s is not None, "--convex_s required"
        convex = stage1_settings()[args.convex_s]
        adam_settings = stage2_settings()
        res = run_stage2_sweep(
            preds, segs, pairs, convex, adam_settings, num_labels,
            verbose=args.verbose,
            checkpoint_path=config.get("output_adam", config["output"]),
            mesh=mesh, setting_batch=args.setting_batch, resume=args.resume,
        )
        np.savez(
            config.get("output_adam", config["output"]),
            dice=res.dice, jstd=res.jstd, hd95=res.hd95, rank=res.rank,
        )
        s1, s2 = res.best // 16, res.best % 16
        iters, kks = decode_adam_variant(s2)
        print(
            f"best adam setting: s1={s1} s2={s2} {adam_settings[s1]} "
            f"iters={iters} extra_smooth={kks}"
        )
        print(f"dice {res.dice[res.best,0]:.4f}/{res.dice[res.best,1]:.4f}")
        return 0

    # infer: rerun chosen settings on test pairs and save fields
    assert args.convex_s is not None and args.adam_s1 is not None
    from convexadam_tpu.selfconfig.infer import run_inference

    run_inference(
        config,
        convex_s=args.convex_s,
        adam_s1=args.adam_s1,
        adam_s2=args.adam_s2 or 0,
        verbose=args.verbose,
    )


if __name__ == "__main__":
    main()
