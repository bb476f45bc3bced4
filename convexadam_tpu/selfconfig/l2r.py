"""Learn2Reg task driver: dataset-descriptor-driven grid ablation, official
statistical ranking, and test-set submission — with a built-in evaluator.

Reference: self_configuring/l2r3.py (orchestrator) +
main_for_l2r3_{MIND,nnUNet}[_testset].py (runners).  The reference delegates
metric computation to the external ``L2R_main.evaluation`` repo (never
vendored, main_for_l2r3_MIND.py:10); this module implements the evaluation
(Dice / HD95 / TRE / SDlogJ, incl. the robust "30" percentile field) itself.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from convexadam_tpu.core.features import mindssc, semantic_features
from convexadam_tpu.core.metrics import (
    dice_coeff,
    hd95,
    jacobian_determinant,
    keypoint_tre,
)
from convexadam_tpu.core.warp import warp_with_displacement
from convexadam_tpu.geometry.io import load_volume_nib_order, save_volume_nib_order
from convexadam_tpu.pipeline.convex_adam import (
    ConvexAdamConfig,
    convex_adam_multi_output,
)
from convexadam_tpu.pipeline.preprocess import mask_infill
from convexadam_tpu.selfconfig.rank import (
    aggregate_ranks,
    noisy_metric_rank,
)


@dataclasses.dataclass
class L2RTask:
    """A Learn2Reg-style task directory with ``<task>_dataset.json``
    (l2r3.py:75-103, main_for_l2r3_MIND.py:27-44)."""

    task_dir: Path
    name: str
    modality_fixed: str = ""
    modality_moving: str = ""
    semantic_features: bool = False
    use_mask: bool = False
    # "voxel" (array-index rows, the L2R CSV default) or "world" (mm rows in
    # the image's physical space — converted through the inverse affine at
    # load time).  Explicit config record, no path-convention guessing.
    keypoint_space: str = "voxel"
    expected_shape: tuple[int, int, int] = (0, 0, 0)
    # task-level label count (dataset.json "labels"); 0 → derive per case.
    # A task-level count keeps per-case metric vectors the same length even
    # when a case is missing the top label id (per-case max would return a
    # shorter dice/hd95 vector and break the grid's np.asarray stacking).
    num_labels: int = 0
    registration_val: list = dataclasses.field(default_factory=list)
    registration_test: list = dataclasses.field(default_factory=list)
    evaluation_methods: list = dataclasses.field(default_factory=list)

    @classmethod
    def load(cls, data_dir, task_name: str) -> "L2RTask":
        task_dir = Path(data_dir) / task_name
        with open(task_dir / f"{task_name}_dataset.json") as f:
            data = json.load(f)
        mods = data.get("modality", {"0": ""})
        modality_fixed = mods.get("0", "")
        modality_moving = mods.get("1", modality_fixed)
        provided = data.get("provided_data", {})
        semantic = any("label" in v for v in provided.values())
        masks = any("mask" in v for v in provided.values())
        kp_space = str(data.get("keypoint_space", "voxel")).lower()
        if kp_space not in ("voxel", "world"):
            raise ValueError(
                f"keypoint_space must be 'voxel' or 'world', got {kp_space!r}"
            )

        eval_cfg = task_dir / f"{task_name}_VAL_evaluation_config.json"
        methods = []
        expected_shape = (0, 0, 0)
        if eval_cfg.exists():
            with open(eval_cfg) as f:
                ec = json.load(f)
            methods = ec.get("evaluation_methods", [])
            expected_shape = tuple(ec.get("expected_shape", (0, 0, 0)))
        # task-level label count: explicit "num_labels", or the max id in a
        # dataset.json "labels" table ({"1": "spleen", ...})
        num_labels = int(data.get("num_labels", 0))
        if not num_labels and isinstance(data.get("labels"), dict):
            ids = [
                int(k) for k in data["labels"].keys()
                if str(k).lstrip("-").isdigit()
            ]
            num_labels = max(ids) if ids else 0
        return cls(
            task_dir=task_dir,
            name=task_name,
            modality_fixed=modality_fixed,
            modality_moving=modality_moving,
            semantic_features=semantic,
            use_mask=masks,
            keypoint_space=kp_space,
            expected_shape=expected_shape,
            registration_val=data.get("registration_val", []),
            registration_test=data.get("registration_test", []),
            evaluation_methods=methods,
            num_labels=num_labels,
        )

    # heuristics from l2r3.py:54-71,97-103
    @property
    def grid_options(self) -> tuple[list[int], list[int], list[float]]:
        vol = int(np.prod(self.expected_shape)) if all(self.expected_shape) else 0
        if vol > 1_000_000:
            grid_sps, disp_hws = [6], [6, 4]
        else:
            grid_sps, disp_hws = [4], [4, 2]
        return grid_sps, disp_hws, [0.75, 1.0, 1.25]

    @property
    def mind_params(self) -> tuple[int, int]:
        if "US" in self.modality_fixed or "US" in self.modality_moving:
            return 3, 3
        return 1, 2


def evaluate_field(
    disp: np.ndarray,
    seg_fixed: Optional[np.ndarray] = None,
    seg_moving: Optional[np.ndarray] = None,
    num_labels: int = 0,
    kpts_fixed: Optional[np.ndarray] = None,
    kpts_moving: Optional[np.ndarray] = None,
    spacing: Optional[np.ndarray] = None,
    compute_hd95: bool = True,
) -> dict:
    """Official-style per-case metrics for a displacement field (H, W, D, 3).

    Returns dice (per label), dice30 (worst-30% labels), hd95, tre (per
    keypoint), sdlogj.
    """
    d = jnp.moveaxis(jnp.asarray(disp, jnp.float32), -1, 0)
    out: dict = {}
    det = np.asarray(jacobian_determinant(d))
    out["sdlogj"] = float(
        np.std(np.log(np.clip(det + 3.0, 1e-9, 1e9)))
    )
    out["neg_jac_frac"] = float(np.mean(det < 0))
    if seg_fixed is not None and num_labels > 0:
        warped = np.asarray(
            warp_with_displacement(
                jnp.asarray(seg_moving, jnp.float32)[None], d, mode="nearest"
            )[0]
        ).round().astype(np.int32)
        dice = np.asarray(
            dice_coeff(jnp.asarray(seg_fixed), jnp.asarray(warped), num_labels + 1)
        )
        out["dice"] = dice
        k = max(1, int((num_labels + 1) * 0.3))
        out["dice30"] = float(np.sort(dice)[:k].mean())
        if compute_hd95:
            from convexadam_tpu.core.edt import MAX_PACKED_EXTENT

            if (
                jax.default_backend() == "tpu"
                and max(seg_fixed.shape) <= MAX_PACKED_EXTENT
                # the device engine packs coordinates into one int32
                # (MAX_PACKED_EXTENT/axis, core/edt.py:surface_lists) —
                # larger grids fall back to the host EDT loop
            ):
                # surface-point-set HD95 on device (core/edt.py) — the host
                # scipy EDT loop costs seconds per case at L2R scale.  Caps
                # are measured exactly from the two volumes: hd95_device's
                # DEFAULTS (64k/256k) silently truncate at exactly the L2R
                # scale this branch exists for (35-label OASIS surfaces)
                from convexadam_tpu.core.edt import hd95_device_sized

                out["hd95"] = np.asarray(
                    hd95_device_sized(seg_fixed, warped, num_labels)
                )
            else:
                out["hd95"] = hd95(seg_fixed, warped, num_labels)
    if kpts_fixed is not None:
        tre = np.asarray(
            keypoint_tre(
                d,
                jnp.asarray(kpts_fixed, jnp.float32),
                jnp.asarray(kpts_moving, jnp.float32),
                None if spacing is None else jnp.asarray(spacing, jnp.float32),
            )
        )
        out["tre"] = tre
        k = max(1, int(len(tre) * 0.3))
        out["tre30"] = float(np.sort(tre)[-k:].mean())
    return out


def _load_case(task: L2RTask, pair: dict):
    """Load one registration case: images + affine, optional keypoints, masks
    (applied as infill), GT labels, and predicted labels (the nnU-Net arm's
    inputs, main_for_l2r3_nnUNet.py:76-80 — ``images → predictedlabels`` path
    substitution; falls back to GT ``labels`` when no predictions exist)."""
    fixed, affine = load_volume_nib_order(task.task_dir / pair["fixed"])
    moving, affine_mov = load_volume_nib_order(task.task_dir / pair["moving"])
    fixed = np.asarray(fixed, np.float32)
    moving = np.asarray(moving, np.float32)

    kf = km = None
    kf_path = task.task_dir / pair["fixed"].replace(
        "images", "keypoints"
    ).replace(".nii.gz", ".csv")
    km_path = task.task_dir / pair["moving"].replace(
        "images", "keypoints"
    ).replace(".nii.gz", ".csv")
    if kf_path.exists() and km_path.exists():
        kf = np.loadtxt(kf_path, delimiter=",").reshape(-1, 3)
        km = np.loadtxt(km_path, delimiter=",").reshape(-1, 3)
        if task.keypoint_space == "world":
            # mm rows in physical space → voxel indices via each image's OWN
            # inverse affine (homogeneous).  L2R pairs share a grid, but a
            # task whose moving image is not resampled onto the fixed grid
            # would otherwise get silently wrong moving-keypoint voxels.
            inv = np.linalg.inv(affine)
            inv_m = np.linalg.inv(affine_mov)
            kf = kf @ inv[:3, :3].T + inv[:3, 3]
            km = km @ inv_m[:3, :3].T + inv_m[:3, 3]

    # per-axis voxel size from the affine columns — the official evaluator
    # reports TRE in mm, not voxels
    spacing = np.linalg.norm(affine[:3, :3], axis=0).astype(np.float32)

    if task.use_mask:
        mf, _ = load_volume_nib_order(
            task.task_dir / pair["fixed"].replace("images", "masks")
        )
        mm, _ = load_volume_nib_order(
            task.task_dir / pair["moving"].replace("images", "masks")
        )
        fixed = mask_infill(fixed, np.asarray(mf, np.float32))
        moving = mask_infill(moving, np.asarray(mm, np.float32))

    seg_f = seg_m = None
    num_labels = 0
    lf = task.task_dir / pair["fixed"].replace("images", "labels")
    lm = task.task_dir / pair["moving"].replace("images", "labels")
    if lf.exists() and lm.exists():
        seg_f = np.asarray(load_volume_nib_order(lf)[0], np.int32)
        seg_m = np.asarray(load_volume_nib_order(lm)[0], np.int32)
        # task-level count keeps metric vectors the same length across
        # cases (a per-case max shrinks when the top label id is absent,
        # making run_validation_grid's stacking ragged)
        num_labels = task.num_labels or int(max(seg_f.max(), seg_m.max()))

    pred_f = pred_m = None
    pf_path = task.task_dir / pair["fixed"].replace("images", "predictedlabels")
    pm_path = task.task_dir / pair["moving"].replace("images", "predictedlabels")
    if pf_path.exists() and pm_path.exists():
        pred_f = np.asarray(load_volume_nib_order(pf_path)[0], np.int32)
        pred_m = np.asarray(load_volume_nib_order(pm_path)[0], np.int32)
    elif seg_f is not None:
        pred_f, pred_m = seg_f, seg_m

    return dict(
        fixed=fixed, moving=moving, affine=affine, spacing=spacing,
        kf=kf, km=km, seg_f=seg_f, seg_m=seg_m, num_labels=num_labels,
        pred_f=pred_f, pred_m=pred_m,
    )


def _arm_features(arm: str, case: dict, mind_r: int, mind_d: int, dtype):
    """Features for one grid-ablation arm: MIND-SSC descriptors or weighted
    one-hot semantic features of the predicted labels
    (main_for_l2r3_nnUNet.py:91-100 → convex_adam_nnUNet.py:19-38)."""
    if arm == "MIND":
        ff = mindssc(jnp.asarray(case["fixed"]), mind_r, mind_d, dtype=dtype)
        fm = mindssc(jnp.asarray(case["moving"]), mind_r, mind_d, dtype=dtype)
        return ff, fm
    if case["pred_f"] is None:
        raise FileNotFoundError(
            "nnUNet arm needs predicted labels (predictedlabels dir) or GT "
            "labels for this pair"
        )
    nl = int(max(case["pred_f"].max(), case["pred_m"].max())) + 1
    return semantic_features(
        jnp.asarray(case["pred_f"]), jnp.asarray(case["pred_m"]),
        num_labels=nl, mult=10.0, dtype=dtype,
    )


def run_validation_grid(
    task: L2RTask,
    output_dir,
    iters: tuple[int, ...] = (40, 60, 80),
    smoothings: tuple[int, ...] = (0, 3, 5),
    dtype: str = "float32",
    verbose: bool = True,
    grid_override: Optional[tuple[list, list, list]] = None,
) -> dict:
    """Run the l2r3 grid ablation over the validation pairs: for every
    (grid_sp, disp_hw, lambda) x {MIND, nnUNet} x 9 output variants, save
    fields and collect per-case metrics (l2r3.py:106-221 +
    main_for_l2r3_{MIND,nnUNet}.py).

    The nnUNet arm runs when the task provides labels (l2r3.py:166),
    registering weighted one-hot features of the predicted segmentations
    (``predictedlabels`` dir, falling back to GT labels); masks are not used
    in that arm (l2r3.py:165 forces use_mask=False).

    Returns {variant_key: {"dice": (cases, L), "sdlogj": (cases,), ...,
    "median_case_time": float}}.
    """
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    mind_r, mind_d = task.mind_params
    grid_sps, disp_hws, lambdas = grid_override or task.grid_options
    arms = ["MIND"] + (["nnUNet"] if task.semantic_features else [])

    results: dict = {}
    for grid_sp in grid_sps:
        for disp_hw in disp_hws:
            for lam in lambdas:
                for arm in arms:
                    key0 = f"{arm};{grid_sp};{disp_hw};{lam}"
                    per_variant = {
                        f"{key0};{it};{sm}": {"dice": [], "dice30": [], "hd95": [],
                                              "sdlogj": [], "time": [],
                                              "tre": [], "tre30": []}
                        for it in iters for sm in smoothings
                    }
                    cfg = ConvexAdamConfig(
                        mind_r=mind_r, mind_d=mind_d, lambda_weight=lam,
                        grid_sp=grid_sp, disp_hw=disp_hw, dtype=dtype,
                    )
                    for pair in task.registration_val:
                        t0 = time.time()
                        case = _load_case(task, pair)
                        ff, fm = _arm_features(
                            arm, case, mind_r, mind_d, cfg.compute_dtype
                        )
                        fields = np.asarray(
                            convex_adam_multi_output(ff, fm, cfg, iters, smoothings),
                            np.float32,
                        )
                        case_time = time.time() - t0

                        for a, it in enumerate(iters):
                            for b, sm in enumerate(smoothings):
                                vkey = f"{key0};{it};{sm}"
                                m = evaluate_field(
                                    fields[a, b], case["seg_f"], case["seg_m"],
                                    case["num_labels"],
                                    kpts_fixed=case["kf"], kpts_moving=case["km"],
                                    spacing=case["spacing"],
                                )
                                r = per_variant[vkey]
                                if "dice" in m:
                                    r["dice"].append(m["dice"])
                                    r["dice30"].append(m["dice30"])
                                    r["hd95"].append(m["hd95"])
                                if "tre" in m:
                                    r["tre"].append(m["tre"])
                                    r["tre30"].append(m["tre30"])
                                r["sdlogj"].append(m["sdlogj"])
                                r["time"].append(case_time)
                                # persist the field like the reference
                                # runners — named by BOTH stems (pairs can
                                # share a fixed image; fixed-only names
                                # overwrite each other), as run_testset does
                                name = (
                                    f"{Path(pair['fixed']).name.split('.')[0]}_"
                                    f"{Path(pair['moving']).name.split('.')[0]}"
                                )
                                save_volume_nib_order(
                                    fields[a, b],
                                    case["affine"],
                                    output_dir / f"disp_{vkey.replace(';', '_')}_{name}.nii.gz",
                                )
                        if verbose:
                            print(f"{key0} case {pair['fixed']}: {case_time:.2f}s")
                    for vkey, r in per_variant.items():
                        results[vkey] = {
                            k: np.asarray(v) for k, v in r.items() if len(v)
                        }
                        results[vkey]["median_case_time"] = float(
                            np.median(r["time"])
                        )
    return results


def select_winner(results: dict, repeats: int = 50) -> tuple[str, np.ndarray]:
    """Official-style winner selection over variant results
    (l2r3.py:298-361): noisy Wilcoxon ranks of {similarity mean, robust30,
    sdlogj, time}, geometric mean double-weighting the similarity metric.
    The similarity is Dice when labels exist, else negated keypoint TRE."""
    keys = list(results.keys())
    if "dice" in results[keys[0]] and len(results[keys[0]].get("dice", [])):
        dice = np.stack([results[k]["dice"].mean(axis=1) for k in keys])
        dice30 = np.stack([results[k]["dice30"] for k in keys])
    else:
        dice = -np.stack([results[k]["tre"].mean(axis=1) for k in keys])
        dice30 = -np.stack([results[k]["tre30"] for k in keys])
    sdlogj = np.stack([results[k]["sdlogj"] for k in keys])
    times = np.stack(
        [np.broadcast_to(results[k]["median_case_time"], dice.shape[1]) for k in keys]
    )
    r0 = noisy_metric_rank(dice, higher_is_better=True, repeats=repeats)
    r1 = noisy_metric_rank(dice30, higher_is_better=True, repeats=repeats)
    r2 = noisy_metric_rank(sdlogj, higher_is_better=False, repeats=repeats)
    r3 = noisy_metric_rank(times, higher_is_better=False, repeats=repeats, noise=0.2)
    agg = aggregate_ranks([r0, r1, r2, r3])
    return keys[int(np.argmax(agg))], agg


def run_testset(
    task: L2RTask,
    winner_key: str,
    output_dir,
    dtype: str = "float32",
) -> list[Path]:
    """Re-run the winning variant on the test pairs and save submission
    fields.  The arm prefix of ``winner_key`` selects the front-end: MIND
    descriptors (main_for_l2r3_MIND_testset.py:13-88) or semantic one-hot
    features of the predicted labels (main_for_l2r3_nnUNet_testset.py:13-88)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    arm, grid_sp, disp_hw, lam, it, sm = winner_key.split(";")
    mind_r, mind_d = task.mind_params
    cfg = ConvexAdamConfig(
        mind_r=mind_r, mind_d=mind_d, lambda_weight=float(lam),
        grid_sp=int(grid_sp), disp_hw=int(disp_hw),
        selected_niter=int(it), selected_smooth=int(sm), dtype=dtype,
    )
    from convexadam_tpu.pipeline.convex_adam import convex_adam_features

    written = []
    for pair in task.registration_test:
        case = _load_case(task, pair)
        ff, fm = _arm_features(arm, case, mind_r, mind_d, cfg.compute_dtype)
        disp = np.asarray(convex_adam_features(ff, fm, cfg), np.float32)
        out = output_dir / (
            f"disp_{Path(pair['fixed']).name.split('.')[0]}_"
            f"{Path(pair['moving']).name.split('.')[0]}.nii.gz"
        )
        save_volume_nib_order(disp, case["affine"], out)
        written.append(out)
    return written
