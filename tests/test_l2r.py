"""Integration test: the L2R task driver end-to-end on a tiny synthetic task."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from convexadam_tpu.geometry.io import save_volume_nib_order
from convexadam_tpu.selfconfig.l2r import (
    L2RTask,
    evaluate_field,
    run_testset,
    run_validation_grid,
    select_winner,
)


@pytest.fixture(scope="module")
def task_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("l2rdata")
    task = root / "SynthTask"
    (task / "images").mkdir(parents=True)
    (task / "labels").mkdir()
    rng = np.random.default_rng(0)
    affine = np.eye(4)

    from scipy.ndimage import uniform_filter

    shape = (36, 36, 36)
    vols, segs = [], []
    for i in range(3):
        o = rng.integers(-2, 3, 3)
        seg = np.zeros(shape, np.int32)
        seg[8 + o[0]: 28 + o[0], 8 + o[1]: 28 + o[1], 8 + o[2]: 28 + o[2]] = 1
        seg[14 + o[0]: 22 + o[0], 14 + o[1]: 22 + o[1], 14 + o[2]: 22 + o[2]] = 2
        vol = uniform_filter(rng.standard_normal(shape).astype(np.float32), 2)
        vol = vol * 30 + seg * 60.0
        save_volume_nib_order(vol, affine, task / "images" / f"case_{i:04d}.nii.gz")
        save_volume_nib_order(
            seg.astype(np.float32), affine, task / "labels" / f"case_{i:04d}.nii.gz"
        )

    dataset = {
        "modality": {"0": "MR"},
        "provided_data": {"0": ["image", "label"]},
        "registration_val": [
            {"fixed": "images/case_0000.nii.gz", "moving": "images/case_0001.nii.gz"},
        ],
        "registration_test": [
            {"fixed": "images/case_0000.nii.gz", "moving": "images/case_0002.nii.gz"},
        ],
    }
    with open(task / "SynthTask_dataset.json", "w") as f:
        json.dump(dataset, f)
    eval_cfg = {
        "evaluation_methods": [
            {"name": "sdlogj"},
            {"name": "dice"},
        ],
        "expected_shape": list(shape),
    }
    with open(task / "SynthTask_VAL_evaluation_config.json", "w") as f:
        json.dump(eval_cfg, f)
    return root


def test_task_loading(task_dir):
    task = L2RTask.load(task_dir, "SynthTask")
    assert task.semantic_features
    assert task.mind_params == (1, 2)
    grid_sps, disp_hws, lambdas = task.grid_options
    assert grid_sps == [4] and disp_hws == [4, 2]  # small volume heuristic
    assert lambdas == [0.75, 1.0, 1.25]


def test_validation_grid_and_winner_and_testset(task_dir, tmp_path):
    task = L2RTask.load(task_dir, "SynthTask")
    results = run_validation_grid(
        task,
        tmp_path / "val",
        iters=(20, 40),
        smoothings=(0, 3),
        verbose=False,
        grid_override=([4], [2], [1.0]),
    )
    assert len(results) == 4  # 1 config x 2 iters x 2 smoothings
    for k, r in results.items():
        assert r["dice"].shape[1] == 2  # labels
        assert "median_case_time" in r

    winner, agg = select_winner(results, repeats=5)
    assert winner in results
    assert agg.shape == (4,)

    written = run_testset(task, winner, tmp_path / "test")
    assert len(written) == 1 and written[0].exists()

    # the winning registration must beat the identity field on dice
    from convexadam_tpu.geometry.io import load_volume_nib_order
    from convexadam_tpu.core.metrics import dice_coeff

    seg_f = np.asarray(
        load_volume_nib_order(task.task_dir / "labels/case_0000.nii.gz")[0], np.int32
    )
    seg_m = np.asarray(
        load_volume_nib_order(task.task_dir / "labels/case_0001.nii.gz")[0], np.int32
    )
    d_ident = float(
        np.asarray(dice_coeff(jnp.asarray(seg_f), jnp.asarray(seg_m), 3)).mean()
    )
    assert results[winner]["dice"].mean() > d_ident


def test_select_winner_tre_only():
    """Winner selection must work for keypoint-TRE tasks (no labels)."""
    rng = np.random.default_rng(0)
    results = {}
    for i, k in enumerate(["a", "b", "c"]):
        results[k] = {
            "tre": rng.random((4, 10)) + (2 - i),  # c has smallest TRE
            "tre30": rng.random(4) + (2 - i),
            "sdlogj": rng.random(4) * 0.1,
            "median_case_time": 1.0,
        }
    winner, agg = select_winner(results, repeats=5)
    assert winner == "c"


def test_evaluate_field_with_keypoints():
    from convexadam_tpu.selfconfig.l2r import evaluate_field

    disp = np.zeros((20, 20, 20, 3), np.float32)
    disp[..., 0] = 2.0
    kf = np.array([[5.0, 5.0, 5.0], [10.0, 8.0, 6.0]], np.float32)
    km = kf + np.array([2.0, 0.0, 0.0], np.float32)
    m = evaluate_field(disp, kpts_fixed=kf, kpts_moving=km)
    np.testing.assert_allclose(m["tre"], 0.0, atol=1e-4)
    assert "sdlogj" in m
