"""CLI smoke tests (in-process, CPU backend)."""

import json

import numpy as np
import pytest

from convexadam_tpu.geometry.io import load_volume_nib_order, save_volume_nib_order


@pytest.fixture(scope="module")
def sweep_config(tmp_path_factory):
    root = tmp_path_factory.mktemp("sweepdata")
    rng = np.random.default_rng(0)
    shape = (32, 32, 32)
    affine = np.eye(4)
    for k in range(3):
        o = rng.integers(-2, 3, 3)
        seg = np.zeros(shape, np.float32)
        seg[8 + o[0]: 26 + o[0], 8 + o[1]: 24 + o[1], 8 + o[2]: 24 + o[2]] = 1
        seg[12 + o[0]: 20 + o[0], 12 + o[1]: 20 + o[1], 12 + o[2]: 20 + o[2]] = 2
        save_volume_nib_order(seg, affine, root / f"pred_{k}.nii.gz")
        save_volume_nib_order(seg, affine, root / f"gt_{k}.nii.gz")
    config = {
        "topk": [0, 1, 2],
        "topk_pair": [[0, 1], [1, 2]],
        "test": [0, 1, 2],
        "test_pair": [[0, 2]],
        "HWD": list(shape),
        "f_predict": str(root / "pred_%d.nii.gz"),
        "f_gt": str(root / "gt_%d.nii.gz"),
        "num_labels": 3,
        "output": str(root / "stage1.npz"),
        "output_adam": str(root / "stage2.npz"),
        "output_dir": str(root / "fields"),
    }
    cfg_path = root / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    return cfg_path, config


def test_sweep_cli_infer(sweep_config, monkeypatch):
    """Drive the infer stage (fast path: single setting, no 100x sweep)."""
    cfg_path, config = sweep_config
    from convexadam_tpu.cli import sweep

    sweep.main(["infer", str(cfg_path), "--convex_s", "0", "--adam_s1", "0",
                "--adam_s2", "1"])
    import pathlib

    fields = list(pathlib.Path(config["output_dir"]).glob("disp_*.nii.gz"))
    assert len(fields) == 1
    disp, _ = load_volume_nib_order(fields[0])
    assert disp.shape == (32, 32, 32, 3)
    assert np.isfinite(disp).all()


def test_register_apply_cli_roundtrip(tmp_path):
    from scipy.ndimage import uniform_filter

    rng = np.random.default_rng(1)
    vol = uniform_filter(rng.standard_normal((40, 40, 40)).astype(np.float32), 2) * 100
    mov = np.roll(vol, (3, -2, 1), axis=(0, 1, 2))
    affine = np.eye(4)
    save_volume_nib_order(vol, affine, tmp_path / "f.nii.gz")
    save_volume_nib_order(mov, affine, tmp_path / "m.nii.gz")

    from convexadam_tpu.cli import apply as apply_cli
    from convexadam_tpu.cli import register

    register.main([
        "-f", str(tmp_path / "f.nii.gz"), "-m", str(tmp_path / "m.nii.gz"),
        "--grid_sp", "4", "--disp_hw", "2", "--selected_niter", "40",
        "--result_path", str(tmp_path),
    ])
    disp, _ = load_volume_nib_order(tmp_path / "disp.nii.gz")
    c = 10
    med = np.median(disp[c:-c, c:-c, c:-c].reshape(-1, 3), axis=0)
    np.testing.assert_allclose(med, [3, -2, 1], atol=0.5)

    apply_cli.main([
        "--input_field", str(tmp_path / "disp.nii.gz"),
        "--input_moving", str(tmp_path / "m.nii.gz"),
        "--output_warped", str(tmp_path / "warped.nii.gz"),
    ])
    warped, _ = load_volume_nib_order(tmp_path / "warped.nii.gz")
    corr = np.corrcoef(
        warped[c:-c, c:-c, c:-c].ravel(), vol[c:-c, c:-c, c:-c].ravel()
    )[0, 1]
    assert corr > 0.95


def test_register_cli_multi_output(tmp_path):
    """--multi_iters emits every (iters x smoothing) variant from one run
    (the self-configuring 9-variant runner,
    self_configuring/convex_adam_MIND.py:115-147)."""
    from scipy.ndimage import uniform_filter

    from convexadam_tpu.cli import register

    rng = np.random.default_rng(0)
    vol = uniform_filter(rng.standard_normal((32, 32, 32)).astype(np.float32), 2) * 100
    mov = np.roll(vol, (2, -1, 1), axis=(0, 1, 2))
    affine = np.eye(4)
    save_volume_nib_order(vol, affine, tmp_path / "fixed.nii.gz")
    save_volume_nib_order(mov, affine, tmp_path / "moving.nii.gz")

    register.main([
        "-f", str(tmp_path / "fixed.nii.gz"),
        "-m", str(tmp_path / "moving.nii.gz"),
        "--grid_sp", "3", "--disp_hw", "2", "--grid_sp_adam", "2",
        "--multi_iters", "10,20", "--multi_smoothings", "0,3",
        "--result_path", str(tmp_path / "out"),
    ])
    written = sorted((tmp_path / "out").glob("disp_*.nii.gz"))
    assert [p.name for p in written] == [
        "disp_10_0.nii.gz", "disp_10_3.nii.gz",
        "disp_20_0.nii.gz", "disp_20_3.nii.gz",
    ]
    d20, _ = load_volume_nib_order(tmp_path / "out" / "disp_20_0.nii.gz")
    assert d20.shape == (32, 32, 32, 3)
    c = 10
    err = np.abs(np.asarray(d20)[c:-c, c:-c, c:-c] - np.array([2, -1, 1], np.float32))
    assert np.mean(np.all(err < 1.0, axis=-1)) > 0.8


def test_console_script_entry_points_resolve():
    """Every [project.scripts] target must import and be callable (the
    pip-installable CLI parity surface)."""
    import importlib
    import pathlib
    import tomllib

    cfg = tomllib.loads(
        (pathlib.Path(__file__).parent.parent / "pyproject.toml").read_text()
    )
    scripts = cfg["project"]["scripts"]
    assert len(scripts) >= 5
    for target in scripts.values():
        mod, attr = target.split(":")
        assert callable(getattr(importlib.import_module(mod), attr))


def test_register_cli_semantic(tmp_path):
    """--semantic: predicted label maps through the nnU-Net front-end
    (reference convex_adam_nnUNet.py:162-191 CLI)."""
    from convexadam_tpu.cli import register

    rng = np.random.default_rng(9)
    affine = np.eye(4)
    seg = np.zeros((24, 24, 24), np.float32)
    o = rng.integers(-2, 3, 3)
    seg[6 + o[0]:18 + o[0], 6 + o[1]:18 + o[1], 6 + o[2]:18 + o[2]] = 1
    seg2 = np.roll(seg, (2, -1, 1), axis=(0, 1, 2))
    save_volume_nib_order(seg, affine, tmp_path / "pf.nii.gz")
    save_volume_nib_order(seg2, affine, tmp_path / "pm.nii.gz")
    register.main([
        "-f", str(tmp_path / "pf.nii.gz"), "-m", str(tmp_path / "pm.nii.gz"),
        "--semantic", "--grid_sp", "3", "--disp_hw", "2",
        "--selected_niter", "6", "--grid_sp_adam", "2",
        "--result_path", str(tmp_path / "out"),
    ])
    disp, _ = load_volume_nib_order(tmp_path / "out" / "disp.nii.gz")
    assert disp.shape == (24, 24, 24, 3)
    assert np.isfinite(np.asarray(disp)).all()
