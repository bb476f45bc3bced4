"""Parity tests for metrics against torch/scipy oracles."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from convexadam_tpu.core import metrics


def test_dice_matches_torch(rng):
    a = rng.integers(0, 4, (10, 10, 10))
    b = rng.integers(0, 4, (10, 10, 10))
    ours = np.asarray(metrics.dice_coeff(jnp.asarray(a), jnp.asarray(b), 4))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    expected = []
    for lab in range(1, 4):
        i = (ta == lab).view(-1).float()
        t = (tb == lab).view(-1).float()
        inter = torch.mean(i * t)
        expected.append((2 * inter / (1e-8 + i.mean() + t.mean())).item())
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_hd95_identical_is_one_and_missing_is_30(rng):
    seg = np.zeros((16, 16, 16), np.int32)
    seg[4:12, 4:12, 4:12] = 1
    out = metrics.hd95(seg, seg, num_labels=2)
    # reference semantics: surfaces are voxels at interior distance exactly 1
    # and distance maps are interior+exterior sums, so identical volumes score
    # 1.0 (convexAdam_hyper_util.py:38-48), not 0
    assert out[0] == 1.0
    assert out[1] == 30.0  # label 2 absent from both


def test_hd95_known_offset():
    a = np.zeros((20, 20, 20), np.int32)
    b = np.zeros((20, 20, 20), np.int32)
    a[5:10, 5:15, 5:15] = 1
    b[8:13, 5:15, 5:15] = 1  # 3-voxel shift along axis 0
    out = metrics.hd95(a, b, num_labels=1)
    assert 2.0 <= out[0] <= 4.0


def test_jacobian_matches_torch_oracle(rng):
    disp = (rng.standard_normal((3, 12, 12, 12)) * 0.5).astype(np.float32)
    ours = np.asarray(metrics.jacobian_determinant(jnp.asarray(disp)))

    # torch oracle re-deriving convexAdam_hyper_util.py:86-108 (convert=False)
    t = torch.from_numpy(disp)[None]
    def gradc(x, dim):
        w = torch.tensor([-0.5, 0.0, 0.5])
        kshape = [3, 1, 1, 1, 1]
        kshape[dim + 2] = 3
        kernel = w.view([1, 1] + kshape[2:]).repeat(3, 1, 1, 1, 1)
        pad = [0, 0, 0]
        pad[dim] = 1
        return F.conv3d(x, kernel, padding=tuple(pad), groups=3)
    jac = torch.cat([gradc(t, 0), gradc(t, 1), gradc(t, 2)], 0) + torch.eye(3).view(3, 3, 1, 1, 1)
    jac = jac[:, :, 2:-2, 2:-2, 2:-2]
    det = (
        jac[0, 0] * (jac[1, 1] * jac[2, 2] - jac[1, 2] * jac[2, 1])
        - jac[1, 0] * (jac[0, 1] * jac[2, 2] - jac[0, 2] * jac[2, 1])
        + jac[2, 0] * (jac[0, 1] * jac[1, 2] - jac[0, 2] * jac[1, 1])
    )
    np.testing.assert_allclose(ours, det.numpy(), rtol=1e-4, atol=1e-5)


def test_jacobian_identity_field():
    disp = np.zeros((3, 10, 10, 10), np.float32)
    det = np.asarray(metrics.jacobian_determinant(jnp.asarray(disp)))
    np.testing.assert_allclose(det, 1.0, atol=1e-6)
    assert float(metrics.sd_log_jacobian(jnp.asarray(disp))) < 1e-4


def test_tre_zero_displacement_equals_distance(rng):
    disp = np.zeros((3, 16, 16, 16), np.float32)
    kf = rng.random((5, 3)).astype(np.float32) * 12 + 2
    km = kf + np.array([1.0, 2.0, 2.0], np.float32)
    tre = np.asarray(
        metrics.keypoint_tre(jnp.asarray(disp), jnp.asarray(kf), jnp.asarray(km))
    )
    np.testing.assert_allclose(tre, 3.0, atol=1e-5)


def test_tre_matches_torch_oracle(rng):
    H = W = D = 16
    disp = (rng.standard_normal((3, H, W, D)) * 2).astype(np.float32)
    kf = (rng.random((7, 3)) * 12 + 2).astype(np.float32)
    km = (kf + rng.standard_normal((7, 3))).astype(np.float32)

    ours = np.asarray(
        metrics.keypoint_tre(jnp.asarray(disp), jnp.asarray(kf), jnp.asarray(km))
    )

    t = torch.from_numpy(disp[::-1].copy())[None]  # torch xyz channel order
    scale1 = torch.tensor([D - 1, W - 1, H - 1]) / 2
    lms = (torch.from_numpy(kf).flip(1) / scale1 - 1).view(1, -1, 1, 1, 3)
    sampled = F.grid_sample(t, lms).squeeze().t()
    sampled = torch.flip(sampled, [1])  # back to array order
    expected = (
        (torch.from_numpy(kf) - torch.from_numpy(km) + sampled)
        .square().sum(-1).sqrt().numpy()
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_ssim_identical_is_one(rng):
    x = rng.standard_normal((20, 20, 20)).astype(np.float32)
    s = float(metrics.ssim3d(jnp.asarray(x), jnp.asarray(x)))
    assert s > 0.999
    y = rng.standard_normal((20, 20, 20)).astype(np.float32)
    s2 = float(metrics.ssim3d(jnp.asarray(x), jnp.asarray(y)))
    assert s2 < 0.9  # well below the golden-test bar of 0.95


def test_sort_rank_matches_torch(rng):
    v = rng.standard_normal(9).astype(np.float32)
    ours = metrics.sort_rank(v)
    tv = torch.from_numpy(v)
    rank1 = torch.ones_like(tv)
    rank1[tv.sort().indices] = torch.linspace(1, 0.1, len(tv))
    np.testing.assert_allclose(ours, rank1.numpy(), rtol=1e-5)


def test_rank_product():
    r1 = np.array([1.0, 0.5, 0.1])
    r2 = np.array([0.1, 0.5, 1.0])
    out = metrics.rank_product([r1, r2])
    np.testing.assert_allclose(out, np.sqrt(r1 * r2))


def test_ssim3d_matches_reference_gaussian_window(rng):
    """ssim3d must reproduce the reference's pytorch-ssim-3D Gaussian-window
    formula (tests/helper_functions.py:100-145) on pre-normalized inputs."""
    import torch
    import torch.nn.functional as F

    from convexadam_tpu.core.metrics import ssim3d

    def torch_ssim3d(a, b, ws=11):
        x = torch.arange(ws, dtype=torch.float32) - ws // 2
        g = torch.exp(-x**2 / (2 * 1.5**2))
        g = (g / g.sum()).unsqueeze(1)
        w2 = g.mm(g.t())
        w3 = g.mm(w2.reshape(1, -1)).reshape(ws, ws, ws)[None, None]
        i1 = torch.from_numpy(a)[None, None]
        i2 = torch.from_numpy(b)[None, None]
        mu1 = F.conv3d(i1, w3, padding=ws // 2)
        mu2 = F.conv3d(i2, w3, padding=ws // 2)
        s11 = F.conv3d(i1 * i1, w3, padding=ws // 2) - mu1**2
        s22 = F.conv3d(i2 * i2, w3, padding=ws // 2) - mu2**2
        s12 = F.conv3d(i1 * i2, w3, padding=ws // 2) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1**2 + mu2**2 + c1) * (s11 + s22 + c2)
        )
        return float(m.mean())

    a = rng.random((20, 18, 16)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
    # feed pre-normalized [0,1] data so ssim3d's joint-range normalization
    # is (nearly) identity and the comparison isolates the window/formula
    a[0, 0, 0], b[0, 0, 0] = 0.0, 1.0  # pin the joint range exactly
    ours = float(ssim3d(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim3d(a, b)
    assert abs(ours - ref) < 1e-4, (ours, ref)
