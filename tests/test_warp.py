"""Parity tests of warp primitives against stock PyTorch ops (CPU).

These validate that our JAX re-derivations reproduce the exact
grid_sample/affine_grid/interpolate conventions the reference pipeline
relies on (see core/warp.py docstring).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from convexadam_tpu.core import warp


def _rand_vol(rng, C=3, H=7, W=9, D=11):
    return rng.standard_normal((C, H, W, D)).astype(np.float32)


@pytest.mark.parametrize("align_corners", [False, True])
def test_identity_grid_matches_affine_grid(align_corners):
    H, W, D = 5, 6, 7
    ours = np.asarray(warp.identity_grid_normalized((H, W, D), align_corners))
    theta = torch.eye(3, 4).unsqueeze(0)
    theirs = F.affine_grid(theta, (1, 1, H, W, D), align_corners=align_corners)[0]
    # torch last dim is (x, y, z) = (D-axis, W-axis, H-axis) → flip to array order
    theirs = theirs.numpy()[..., ::-1]
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, align_corners, padding_mode, mode):
    vol = _rand_vol(rng)
    # grid extends beyond [-1, 1] to exercise padding behaviour
    grid = rng.uniform(-1.4, 1.4, size=(4, 5, 6, 3)).astype(np.float32)

    ours = np.asarray(
        warp.grid_sample_3d(
            jnp.asarray(vol),
            jnp.asarray(grid),
            align_corners=align_corners,
            padding_mode=padding_mode,
            mode=mode,
        )
    )

    tvol = torch.from_numpy(vol).unsqueeze(0)
    tgrid = torch.from_numpy(grid[..., ::-1].copy()).unsqueeze(0)
    theirs = F.grid_sample(
        tvol, tgrid, mode=mode, padding_mode=padding_mode, align_corners=align_corners
    )[0].numpy()

    if mode == "nearest":
        # rounding of near-.5 source coordinates may differ between torch
        # and JAX — actually EXCLUDE those outputs from the comparison
        H, W, D = vol.shape[1:]
        dims = np.array([H, W, D], np.float64)
        g = grid.astype(np.float64)
        if align_corners:
            v = (g + 1.0) * (dims - 1.0) / 2.0
        else:
            v = ((g + 1.0) * dims - 1.0) / 2.0
        tie = (np.abs((v % 1.0) - 0.5) < 1e-4).any(axis=-1)  # (Hg, Wg, Dg)
        ok = np.broadcast_to(~tie[None], ours.shape)
        np.testing.assert_allclose(ours[ok], theirs[ok], atol=1e-5)
        assert ok.mean() > 0.9  # the mask must not hide the comparison
    else:
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("size", [(10, 14, 22), (3, 4, 5), (7, 9, 11)])
def test_resize_trilinear_matches_interpolate(rng, align_corners, size):
    vol = _rand_vol(rng)
    ours = np.asarray(
        warp.resize_trilinear(jnp.asarray(vol), size, align_corners=align_corners)
    )
    theirs = F.interpolate(
        torch.from_numpy(vol).unsqueeze(0),
        size=size,
        mode="trilinear",
        align_corners=align_corners,
    )[0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_map_coordinates_matches_scipy(rng):
    from scipy.ndimage import map_coordinates

    vol = rng.standard_normal((6, 7, 8)).astype(np.float32)
    coords = rng.uniform(-1.0, 8.0, size=(3, 5, 5, 5)).astype(np.float32)
    ours = np.asarray(
        warp.map_coordinates_trilinear(jnp.asarray(vol), jnp.asarray(coords))
    )
    theirs = map_coordinates(vol, coords, order=1, mode="constant")
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_inverse_consistency_matches_torch(rng):
    """Mirror the reference inverse_consistency (convex_adam_utils.py:114-129)
    with torch primitives and compare."""
    H, W, D = 6, 7, 8
    d1 = (rng.standard_normal((3, H, W, D)) * 0.05).astype(np.float32)
    d2 = (rng.standard_normal((3, H, W, D)) * 0.05).astype(np.float32)

    ours1, ours2 = warp.inverse_consistency(jnp.asarray(d1), jnp.asarray(d2), iters=5)

    # torch reference computation (array-order channels flipped to torch xyz)
    t1 = torch.from_numpy(d1[::-1].copy()).unsqueeze(0)
    t2 = torch.from_numpy(d2[::-1].copy()).unsqueeze(0)
    identity = (
        F.affine_grid(torch.eye(3, 4).unsqueeze(0), (1, 1, H, W, D))
        .permute(0, 4, 1, 2, 3)
    )
    a, b = t1.clone(), t2.clone()
    for _ in range(5):
        s1, s2 = a.clone(), b.clone()
        a = 0.5 * (s1 - F.grid_sample(s2, (identity + s1).permute(0, 2, 3, 4, 1)))
        b = 0.5 * (s2 - F.grid_sample(s1, (identity + s2).permute(0, 2, 3, 4, 1)))
    theirs1 = a[0].numpy()[::-1]
    theirs2 = b[0].numpy()[::-1]

    np.testing.assert_allclose(np.asarray(ours1), theirs1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours2), theirs2, atol=1e-5)


def test_warp_with_displacement_zero_is_identity(rng):
    vol = _rand_vol(rng, C=2, H=8, W=8, D=8)
    disp = np.zeros((3, 8, 8, 8), np.float32)
    out = np.asarray(warp.warp_with_displacement(jnp.asarray(vol), jnp.asarray(disp)))
    np.testing.assert_allclose(out, vol, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_grad_matches_torch(rng, align_corners, padding_mode):
    """The custom VJP must match torch's grid_sample backward in both vol
    and grid cotangents."""
    import jax

    vol = _rand_vol(rng, C=2, H=5, W=6, D=7)
    grid = rng.uniform(-1.2, 1.2, size=(4, 3, 2, 3)).astype(np.float32)
    ct = rng.standard_normal((2, 4, 3, 2)).astype(np.float32)

    def f(v, g):
        out = warp.grid_sample_3d(
            jnp.asarray(v), jnp.asarray(g),
            align_corners=align_corners, padding_mode=padding_mode,
        )
        return jnp.sum(out * jnp.asarray(ct))

    dv, dg = jax.grad(f, argnums=(0, 1))(jnp.asarray(vol), jnp.asarray(grid))

    tvol = torch.from_numpy(vol).unsqueeze(0).requires_grad_(True)
    tgrid = torch.from_numpy(grid[..., ::-1].copy()).unsqueeze(0).requires_grad_(True)
    out = F.grid_sample(
        tvol, tgrid, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners,
    )
    (out * torch.from_numpy(ct).unsqueeze(0)).sum().backward()

    np.testing.assert_allclose(np.asarray(dv), tvol.grad[0].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dg), tgrid.grad[0].numpy()[..., ::-1], atol=1e-4
    )


def test_stacked_sampler_matches_plain(rng):
    """The corner-stacked fast path must be numerically identical to the
    plain sampler in both value and displacement gradient, including at
    borders and with out-of-range samples."""
    import jax

    C, H, W, D = 3, 7, 8, 6
    vol = _rand_vol(rng, C=C, H=H, W=W, D=D)
    disp = (rng.standard_normal((3, H, W, D)) * 3.0).astype(np.float32)

    plain = warp.warp_with_displacement(jnp.asarray(vol), jnp.asarray(disp))
    vol8 = warp.build_corner_stack(jnp.asarray(vol))
    stacked = warp.warp_with_displacement_stacked(
        vol8, (C, H, W, D), jnp.asarray(disp)
    )
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(plain), atol=1e-5)

    g_plain = jax.grad(
        lambda d: jnp.sum(warp.warp_with_displacement(jnp.asarray(vol), d) ** 2)
    )(jnp.asarray(disp))
    g_stacked = jax.grad(
        lambda d: jnp.sum(
            warp.warp_with_displacement_stacked(vol8, (C, H, W, D), d) ** 2
        )
    )(jnp.asarray(disp))
    np.testing.assert_allclose(
        np.asarray(g_stacked), np.asarray(g_plain), rtol=1e-4, atol=1e-4
    )
