"""Mask-infill preprocessing parity vs a torch/scipy oracle."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from scipy.ndimage import distance_transform_edt as edt

from convexadam_tpu.pipeline.preprocess import mask_infill


def _oracle(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Re-derivation of extract_features' use_mask branch
    (convex_adam_MIND.py:36-51) with stock torch/scipy ops."""
    H, W, D = img.shape
    timg = torch.from_numpy(img)
    tmask = torch.from_numpy(mask)
    avg3 = nn.Sequential(nn.ReplicationPad3d(1), nn.AvgPool3d(3, stride=1))
    m = (avg3(tmask.view(1, 1, H, W, D)) > 0.9).float()
    _, idx = edt((m[0, 0, ::2, ::2, ::2] == 0).numpy(), return_indices=True)
    gathered = (
        timg[::2, ::2, ::2]
        .reshape(-1)[idx[0] * D // 2 * W // 2 + idx[1] * D // 2 + idx[2]]
        .unsqueeze(0)
        .unsqueeze(0)
    )
    filled = F.interpolate(gathered, scale_factor=2, mode="trilinear")
    out = filled.reshape(-1).clone()
    out[m.view(-1) != 0] = timg.reshape(-1)[m.view(-1) != 0]
    return out.view(H, W, D).numpy()


def test_mask_infill_matches_oracle(rng):
    H = W = D = 24
    img = rng.standard_normal((H, W, D)).astype(np.float32) * 50
    mask = np.zeros((H, W, D), np.float32)
    mask[6:18, 4:20, 8:16] = 1.0

    ours = mask_infill(img, mask)
    oracle = _oracle(img, mask)

    # inside the (dilated) mask: exact original values
    # outside: nearest-inside infill — identical up to EDT tie-breaking, so
    # compare with a tolerant match fraction plus exact interior equality
    inside = _dilated(mask) != 0
    np.testing.assert_allclose(ours[inside], img[inside], atol=1e-5)
    frac_equal = np.mean(np.isclose(ours, oracle, atol=1e-4))
    assert frac_equal > 0.95, f"only {frac_equal:.2%} voxels match oracle"


def test_mask_infill_odd_dims(rng):
    """Odd spatial dims: the half-res strides must use the ceil-sized array
    shape and the x2 upsample must crop back — previously this crashed on
    broadcast (e.g. a 192x192x207 lung CT) and gathered misaligned voxels."""
    H, W, D = 23, 24, 21
    img = rng.standard_normal((H, W, D)).astype(np.float32) * 50
    mask = np.zeros((H, W, D), np.float32)
    mask[6:17, 4:20, 5:16] = 1.0

    ours = mask_infill(img, mask)
    assert ours.shape == (H, W, D)
    inside = _dilated(mask) != 0
    np.testing.assert_allclose(ours[inside], img[inside], atol=1e-5)
    # outside values must be genuine inside-mask values (nearest-neighbour
    # infill at half res never invents data): every outside voxel's infill
    # must appear among the half-grid inside values
    half_vals = img[::2, ::2, ::2][_dilated(mask)[::2, ::2, ::2] != 0]
    lo, hi = half_vals.min(), half_vals.max()
    assert ours[~inside].min() >= lo - 1e-4 and ours[~inside].max() <= hi + 1e-4


def _dilated(mask):
    t = torch.from_numpy(mask)
    H, W, D = mask.shape
    avg3 = torch.nn.Sequential(
        torch.nn.ReplicationPad3d(1), torch.nn.AvgPool3d(3, stride=1)
    )
    return (avg3(t.view(1, 1, H, W, D)) > 0.9).float().view(H, W, D).numpy()
