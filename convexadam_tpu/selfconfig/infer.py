"""Test-set inference with chosen sweep settings.

Reference: infer_convexadam.py:47-251 — rerun the chosen convex setting and
the decoded Adam variant on the test pairs, write ``disp_<f>_<m>.nii.gz``
displacement fields (and evaluate when ground truth is available).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.adam import adam_instance_optimisation
from convexadam_tpu.core.features import label_counts, semantic_features
from convexadam_tpu.core.smoothing import avg_pool3d, box_smooth_repeated
from convexadam_tpu.core.warp import resize_trilinear
from convexadam_tpu.geometry.io import load_volume_nib_order, save_volume_nib_order
from convexadam_tpu.selfconfig.engine import convex_field_semantic
from convexadam_tpu.selfconfig.settings import (
    decode_adam_variant,
    stage1_settings,
    stage2_settings,
)


def run_inference(
    config: dict,
    convex_s: int,
    adam_s1: int,
    adam_s2: int,
    output_dir=None,
    verbose: bool = False,
) -> list[Path]:
    """Run chosen settings on ``config['test_pair']`` over ``config['test']``
    case ids (infer_convexadam.py:162-240)."""
    st1 = stage1_settings()[convex_s]
    st2 = stage2_settings()[adam_s1]
    iters, kks = decode_adam_variant(adam_s2)

    num_labels = config["num_labels"] - 1
    H, W, D = config["HWD"]
    test_ids = config.get("test", config.get("topk"))
    test_pairs = [tuple(p) for p in config.get("test_pair", config.get("topk_pair"))]
    output_dir = Path(output_dir or config.get("output_dir", "."))
    output_dir.mkdir(parents=True, exist_ok=True)

    preds = []
    affines = []
    for k in test_ids:
        p, aff = load_volume_nib_order(config["f_predict"] % k)
        preds.append(np.asarray(p[:H, :W, :D], np.int32))
        affines.append(aff)
    preds_j = jnp.asarray(np.stack(preds))

    g2 = st2.grid_sp_adam

    @jax.jit
    def register(pf, pm):
        disp_lr = convex_field_semantic(
            pf, pm, jnp.float32(st1.nn_mult),
            num_labels=num_labels + 1, grid_sp=st1.grid_sp,
            disp_hw=st1.disp_hw, coarse=True,
        )
        disp_hr = resize_trilinear(disp_lr, (H, W, D), align_corners=False)
        ff, fm = semantic_features(pf, pm, num_labels=num_labels + 1, mult=st1.nn_mult)
        patch_fix = avg_pool3d(ff, g2, stride=g2)
        patch_mov = avg_pool3d(fm, g2, stride=g2)
        dlr = resize_trilinear(
            disp_hr, (H // g2, W // g2, D // g2), align_corners=False
        )
        counts = label_counts(pf, num_labels + 1) + label_counts(
            pm, num_labels + 1
        )
        n_ch = jnp.sum(counts > 0).astype(jnp.float32)
        final, _ = adam_instance_optimisation(
            patch_fix, patch_mov, dlr / g2,
            jnp.float32(st2.lambda_weight), niter=iters,
            smoother=("bank", st2.effective_avg_n), cost_scale=n_ch,
        )
        out = resize_trilinear(final * g2, (H, W, D), align_corners=False)
        for _ in range(kks):
            out = box_smooth_repeated(out, 3, 1)
        return jnp.moveaxis(out, 0, -1)

    written = []
    for (i, j) in test_pairs:
        disp = np.asarray(register(preds_j[i], preds_j[j]), np.float32)
        out = output_dir / f"disp_{test_ids[i]}_{test_ids[j]}.nii.gz"
        save_volume_nib_order(disp, affines[i], out)
        written.append(out)
        if verbose:
            print(f"wrote {out}")
    return written
