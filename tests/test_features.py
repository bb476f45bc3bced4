"""Parity tests for the MIND-SSC descriptor and semantic features.

The oracle re-derives the descriptor from its specification (Heinrich et al.,
MICCAI 2013 self-similarity context) using stock torch ops, structured
independently from both the reference repo and our JAX implementation, so the
three agree only if the math agrees.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from convexadam_tpu.core import features


def test_shift_pairs_structure():
    pairs = features._mind_shift_pairs()
    assert len(pairs) == 12
    # every pair is two distinct six-neighbourhood points at squared dist 2
    six = {(0, 1, 1), (1, 1, 0), (1, 0, 1), (1, 1, 2), (2, 1, 1), (1, 2, 1)}
    for a, b in pairs:
        assert a in six and b in six and a != b
        assert sum((x - y) ** 2 for x, y in zip(a, b)) == 2


@pytest.mark.parametrize("dilation", [1, 2])
def test_shifted_replicate_equals_onehot_dilated_conv(rng, dilation):
    """A one-hot 3x3x3 conv with dilation on a replicate-padded volume is a
    clamped shift — validates our reading of convex_adam_utils.py:48-56."""
    img = rng.standard_normal((1, 1, 8, 9, 10)).astype(np.float32)
    t = torch.from_numpy(img)
    for pos in [(0, 1, 1), (1, 1, 0), (2, 1, 1), (1, 2, 1), (1, 0, 1), (1, 1, 2)]:
        kernel = torch.zeros(1, 1, 3, 3, 3)
        kernel[0, 0, pos[0], pos[1], pos[2]] = 1
        conv = F.conv3d(nn.ReplicationPad3d(dilation)(t), kernel, dilation=dilation)
        offset = tuple((p - 1) * dilation for p in pos)
        ours = features.shifted_replicate(jnp.asarray(img[0, 0]), offset)
        np.testing.assert_allclose(np.asarray(ours), conv[0, 0].numpy(), atol=1e-6)


def _mind_oracle_torch(img: np.ndarray, radius: int, dilation: int) -> np.ndarray:
    """Spec-derived MIND-SSC oracle in torch (independent structure)."""
    t = torch.from_numpy(img)[None, None]

    def shift(x, off):
        m = max(abs(o) for o in off)
        if m == 0:
            return x
        xp = nn.ReplicationPad3d(m)(x)
        H, W, D = x.shape[-3:]
        return xp[
            :, :,
            m + off[0]: m + off[0] + H,
            m + off[1]: m + off[1] + W,
            m + off[2]: m + off[2] + D,
        ]

    chans = []
    for (s1, s2) in features._mind_shift_pairs():
        o1 = tuple((c - 1) * dilation for c in s1)
        o2 = tuple((c - 1) * dilation for c in s2)
        chans.append((shift(t, o1) - shift(t, o2)) ** 2)
    ssd = torch.cat(chans, dim=1)
    k = 2 * radius + 1
    ssd = F.avg_pool3d(nn.ReplicationPad3d(radius)(ssd), k, stride=1)
    mind = ssd - ssd.min(dim=1, keepdim=True).values
    var = mind.mean(dim=1, keepdim=True)
    gm = var.mean().item()
    var = torch.clamp(var, gm * 0.001, gm * 1000)
    mind = torch.exp(-mind / var)
    perm = torch.tensor(features.MIND_CHANNEL_PERMUTATION)
    return mind[0, perm].numpy()


@pytest.mark.parametrize("radius,dilation", [(1, 2), (2, 2), (3, 3)])
def test_mindssc_matches_oracle(rng, radius, dilation):
    img = rng.standard_normal((10, 11, 12)).astype(np.float32) * 50 + 100
    ours = np.asarray(features.mindssc(jnp.asarray(img), radius, dilation))
    oracle = _mind_oracle_torch(img, radius, dilation)
    assert ours.shape == (12,) + img.shape
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_mindssc_range():
    # (a perfectly constant image is 0/0 = NaN in the reference too, since the
    # variance clamp bounds are mean*0.001 = 0 — convex_adam_utils.py:61)
    rng = np.random.default_rng(1)
    out = np.asarray(features.mindssc(jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))))
    assert out.min() > 0 and out.max() <= 1.0 + 1e-6


def test_semantic_features_match_torch_semantics(rng):
    """Check weighting math against a torch recomputation restricted to
    present labels (convex_adam_nnUNet.py:19-38 semantics)."""
    labels_f = rng.integers(0, 5, size=(6, 7, 8))
    labels_m = rng.integers(0, 5, size=(6, 7, 8))
    # make label 3 absent from both to exercise zero-weighting
    labels_f[labels_f == 3] = 0
    labels_m[labels_m == 3] = 0
    num_labels = 6  # labels 3 and 5 absent

    ours_f, ours_m = features.semantic_features(
        jnp.asarray(labels_f), jnp.asarray(labels_m), num_labels=num_labels
    )

    tf = torch.from_numpy(labels_f).long()
    tm = torch.from_numpy(labels_m).long()
    eps = 1e-32
    maxl = num_labels
    bins = torch.bincount(tf.reshape(-1), minlength=maxl) + torch.bincount(
        tm.reshape(-1), minlength=maxl
    )
    pos = torch.nonzero(bins).reshape(-1)
    ohf = F.one_hot(tf, maxl)[..., pos].float()
    ohm = F.one_hot(tm, maxl)[..., pos].float()
    cnt = torch.bincount(
        torch.cat([ohf.argmax(-1).reshape(-1), ohm.argmax(-1).reshape(-1)])
    )
    w = 1 / (cnt + eps).float().pow(0.3)
    w /= w.mean()
    exp_f = 10 * ohf * w
    exp_m = 10 * ohm * w

    # compare channel-by-channel on present labels; absent must be all-zero
    ours_f = np.asarray(ours_f)
    ours_m = np.asarray(ours_m)
    for ci, lab in enumerate(pos.tolist()):
        np.testing.assert_allclose(
            ours_f[lab], exp_f[..., ci].numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            ours_m[lab], exp_m[..., ci].numpy(), rtol=1e-5, atol=1e-6
        )
    for lab in range(num_labels):
        if lab not in pos.tolist():
            assert np.all(ours_f[lab] == 0) and np.all(ours_m[lab] == 0)


def test_nnunet_norm_matches_torch(rng):
    img = rng.standard_normal((9, 9, 9)).astype(np.float32)
    img[img < -0.5] = 0.0
    ours = np.asarray(features.nnunet_norm(jnp.asarray(img)))
    t = torch.from_numpy(img.copy())
    mask = t > 0
    out = (t - t[mask].mean()) / (t[mask].std() + 1e-8)
    out[~mask] = 0
    np.testing.assert_allclose(ours, out.numpy(), rtol=1e-4, atol=1e-5)


def test_nnunet_ct_norm_matches_torch(rng):
    img = (rng.standard_normal((9, 9, 9)) * 700).astype(np.float32)
    ours = np.asarray(features.nnunet_ct_norm(jnp.asarray(img)))
    t = torch.clamp(torch.from_numpy(img.copy()), -1000, 1500)
    mean, std = t.mean(), t.std()
    lo, hi = torch.quantile(t, 0.005), torch.quantile(t, 0.995)
    out = (torch.clamp(t, lo, hi) - mean) / std
    np.testing.assert_allclose(ours, out.numpy(), rtol=1e-4, atol=1e-4)
