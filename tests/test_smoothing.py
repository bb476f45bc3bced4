"""Parity tests of smoothing ops against stock PyTorch pooling/conv ops."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from convexadam_tpu.core import smoothing


def _rand(rng, shape=(2, 9, 10, 11)):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("kernel,stride,padding", [(3, 1, 1), (2, 2, 0), (6, 6, 0), (5, 1, 2), (3, 3, 0)])
def test_avg_pool3d_matches_torch(rng, kernel, stride, padding):
    x = _rand(rng, (2, 12, 13, 14))
    ours = np.asarray(smoothing.avg_pool3d(jnp.asarray(x), kernel, stride, padding))
    theirs = F.avg_pool3d(
        torch.from_numpy(x).unsqueeze(0), kernel, stride=stride, padding=padding
    )[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("kernel", [3, 5])
def test_avg_pool3d_replicate_matches_torch(rng, kernel):
    x = _rand(rng, (1, 8, 9, 10))
    ours = np.asarray(smoothing.avg_pool3d_replicate(jnp.asarray(x), kernel))
    r = kernel // 2
    theirs = F.avg_pool3d(
        nn.ReplicationPad3d(r)(torch.from_numpy(x).unsqueeze(0)), kernel, stride=1
    )[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_box_smooth_repeated_matches_triple_pool(rng):
    x = _rand(rng, (3, 8, 8, 8))
    ours = np.asarray(smoothing.box_smooth_repeated(jnp.asarray(x), 3, 3))
    t = torch.from_numpy(x).unsqueeze(0)
    for _ in range(3):
        t = F.avg_pool3d(t, 3, stride=1, padding=1)
    np.testing.assert_allclose(ours, t[0].numpy(), atol=1e-5)


def test_gaussian_smooth_matches_reference_construction(rng):
    """Rebuild the reference `smooth` (convexAdam_hyper_util.py:439-452) from
    torch primitives and compare."""
    sigma = 1.3
    x = _rand(rng, (1, 9, 9, 9))

    ours = np.asarray(smoothing.gaussian_smooth(jnp.asarray(x), sigma))

    n = int(np.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    w = torch.exp(
        -torch.pow(torch.linspace(-(n // 2), n // 2, n), 2) / (2 * sigma**2)
    )
    w /= w.sum()
    t = torch.from_numpy(x).unsqueeze(0)
    for dim in range(3):
        pad = [0] * 6
        pad[4 - 2 * dim] = n // 2
        pad[5 - 2 * dim] = n // 2
        view = [1] * 5
        view[dim + 2] = -1
        B, C, D_, H_, W_ = t.shape
        t = F.conv3d(
            F.pad(t.view(B * C, 1, D_, H_, W_), pad, mode="replicate"),
            w.view(view),
        ).view(B, C, D_, H_, W_)
    np.testing.assert_allclose(ours, t[0].numpy(), atol=1e-5)


@pytest.mark.parametrize("sigma", [0.7, 1.0, 1.6, 2.5])
def test_kovesi_widths_match_reference_formula(sigma):
    n = 4
    w_ideal = np.sqrt(12 * sigma**2 / n + 1)
    w_u = int(np.ceil((w_ideal - 1) / 2) * 2 + 1)
    w_l = max(w_u - 2, 1)
    m = int(np.round((12 * sigma**2 - n * w_l**2 - 4 * n * w_l - 3 * n) / (-4 * w_l - 4)))
    expected = [w_l] * (m if w_l > 1 else 0) + [w_u] * (n - m)
    assert smoothing.kovesi_widths(sigma, n) == expected


def test_kovesi_spline_matches_avgpool_cascade(rng):
    x = _rand(rng, (1, 10, 10, 10))
    sigma = 1.6
    ours = np.asarray(smoothing.kovesi_spline(jnp.asarray(x), sigma))
    t = torch.from_numpy(x).unsqueeze(0)
    for w in smoothing.kovesi_widths(sigma):
        t = F.avg_pool3d(t, w, stride=1, padding=(w - 1) // 2)
    np.testing.assert_allclose(ours, t[0].numpy(), atol=1e-5)
