"""Tests for rigid fitting and TPS densification."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from convexadam_tpu.core import rigid


def _random_rigid(rng):
    # random rotation via QR
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.standard_normal(3) * 5
    T = np.eye(4)
    T[:3, :3] = Q
    T[:3, 3] = t
    return T


def test_find_rigid_3d_recovers_transform(rng):
    T = _random_rigid(rng)
    x = rng.standard_normal((30, 3)) * 10
    y = x @ T[:3, :3].T + T[:3, 3]
    T_est = np.asarray(rigid.find_rigid_3d(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(T_est, T, atol=1e-4)


def test_find_rigid_matches_torch_oracle(rng):
    x = rng.standard_normal((20, 3)).astype(np.float32)
    y = (rng.standard_normal((20, 3)) * 2).astype(np.float32)
    ours = np.asarray(rigid.find_rigid_3d(jnp.asarray(x), jnp.asarray(y)))

    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    xm, ym = tx.mean(0), ty.mean(0)
    u, s, v = torch.svd((tx - xm).t() @ (ty - ym))
    m = torch.eye(3)
    m[-1, -1] = torch.det(v @ u.t())
    rot = v @ m @ u.t()
    trans = ym - rot @ xm
    T = torch.eye(4)
    T[:3, :3] = rot
    T[:3, 3] = trans
    np.testing.assert_allclose(ours, T.numpy(), atol=1e-4)


def test_least_trimmed_rigid_robust_to_outliers(rng):
    T = _random_rigid(rng)
    x = rng.standard_normal((60, 3)) * 10
    y = x @ T[:3, :3].T + T[:3, 3]
    # corrupt 25% of correspondences
    y_corrupt = y.copy()
    y_corrupt[:15] += rng.standard_normal((15, 3)) * 40
    xh = np.concatenate([x, np.ones((60, 1))], 1)
    yh = np.concatenate([y_corrupt, np.ones((60, 1))], 1)
    T_est = np.asarray(
        rigid.least_trimmed_rigid(jnp.asarray(xh), jnp.asarray(yh))
    )
    np.testing.assert_allclose(T_est[:3, :3], T[:3, :3], atol=1e-3)
    np.testing.assert_allclose(T_est[:3, 3], T[:3, 3], atol=1e-2)


def test_tps_interpolates_control_points(rng):
    c = rng.standard_normal((12, 3)).astype(np.float32)
    f = rng.standard_normal((12, 3)).astype(np.float32)
    theta = rigid.tps_fit(jnp.asarray(c), jnp.asarray(f), lambd=0.0)
    vals = np.asarray(rigid.tps_eval(jnp.asarray(c), jnp.asarray(c), theta))
    np.testing.assert_allclose(vals, f, atol=1e-3)


def test_thin_plate_dense_constant_field(rng):
    """Constant control displacements densify to a constant field."""
    c = (rng.random((10, 3)).astype(np.float32) * 1.6 - 0.8)
    f = np.tile(np.array([[0.1, -0.2, 0.05]], np.float32), (10, 1))
    out = np.asarray(
        rigid.thin_plate_dense(
            jnp.asarray(c), jnp.asarray(f), shape=(16, 16, 16), step=2
        )
    )
    assert out.shape == (16, 16, 16, 3)
    np.testing.assert_allclose(
        out, np.broadcast_to(f[0], (16, 16, 16, 3)), atol=1e-3
    )


def test_rigid_from_field_recovers_translation(rng):
    import jax.numpy as jnp

    disp = np.tile(
        np.array([2.0, -1.0, 3.0], np.float32).reshape(3, 1, 1, 1), (1, 24, 24, 24)
    )
    T = np.asarray(rigid.rigid_from_field(jnp.asarray(disp), num_samples=512))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], [2.0, -1.0, 3.0], atol=1e-2)
