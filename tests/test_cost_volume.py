"""Parity tests for the SSD cost volume and coupled-convex solver.

Oracles are spec-derived torch implementations (direct displacement loops,
not the reference's unfold trick) so that layout agreement is a real check.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from convexadam_tpu.core import convex, cost_volume


def _correlate_oracle(fix: np.ndarray, mov: np.ndarray, q: int):
    """Direct-loop SSD cost volume in torch, reference layout
    k = kd*K^2 + kw*K + kh (convex_adam_utils.py:72-89)."""
    C, H, W, D = fix.shape
    K = 2 * q + 1
    tf = torch.from_numpy(fix)
    tm = torch.from_numpy(mov)
    tmp = F.pad(tm, (q, q, q, q, q, q))
    ssd = torch.zeros(K**3, H, W, D)
    for kd in range(K):
        for kw in range(K):
            for kh in range(K):
                sl = tmp[:, kh:kh + H, kw:kw + W, kd:kd + D]
                ssd[kd * K * K + kw * K + kh] = ((tf - sl) ** 2).sum(0)
    ssd = ssd.unsqueeze(0)
    ssd = F.avg_pool3d(ssd, 3, stride=1, padding=1)
    ssd = F.avg_pool3d(ssd, 3, stride=1, padding=1)[0]
    return ssd.numpy(), ssd.argmin(0).numpy()


def test_correlate_matches_oracle(rng):
    C, H, W, D, q = 4, 6, 7, 5, 2
    fix = rng.standard_normal((C, H, W, D)).astype(np.float32)
    mov = rng.standard_normal((C, H, W, D)).astype(np.float32)
    ssd, am = cost_volume.correlate(jnp.asarray(fix), jnp.asarray(mov), q)
    ssd_o, am_o = _correlate_oracle(fix, mov, q)
    np.testing.assert_allclose(np.asarray(ssd), ssd_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(am), am_o)


def test_correlate_layout_matches_reference_unfold(rng):
    """Validate the displacement-axis layout against the reference's actual
    unfold-based construction (convex_adam_utils.py:76-86) rebuilt in torch."""
    C, H, W, D, q = 3, 5, 6, 4, 1
    K = 2 * q + 1
    fix = rng.standard_normal((1, C, H, W, D)).astype(np.float32)
    mov = rng.standard_normal((1, C, H, W, D)).astype(np.float32)

    tf = torch.from_numpy(fix)
    tm = torch.from_numpy(mov)
    unf = F.unfold(F.pad(tm, (q, q, q, q, q, q)).squeeze(0), K)
    unf = unf.view(C, -1, K**2, W, D)
    ssd_t = torch.zeros(K**3, H, W, D)
    for i in range(K):
        s = (tf.permute(1, 2, 0, 3, 4) - unf[:, i:i + H]).pow(2).sum(0, keepdim=True)
        ssd_t[i::K] = F.avg_pool3d(
            F.avg_pool3d(s.transpose(2, 1), 3, stride=1, padding=1),
            3, stride=1, padding=1,
        ).squeeze(1)
    ssd_t = (
        ssd_t.view(K, K, K, H, W, D).transpose(1, 0).reshape(K**3, H, W, D)
    )

    ssd, _ = cost_volume.correlate(jnp.asarray(fix[0]), jnp.asarray(mov[0]), q)
    np.testing.assert_allclose(np.asarray(ssd), ssd_t.numpy(), rtol=1e-4, atol=1e-5)


def test_displacement_mesh_matches_affine_grid():
    q = 2
    K = 2 * q + 1
    mesh = np.asarray(cost_volume.displacement_mesh(q))
    theirs = (
        F.affine_grid(
            q * torch.eye(3, 4).unsqueeze(0),
            (1, 1, K, K, K),
            align_corners=True,
        )
        .permute(0, 4, 1, 2, 3)
        .reshape(3, -1)
        .numpy()
    )
    # torch's (x, y, z) grid channels paired with the ssd layout
    # k = kd*K^2 + kw*K + kh give x = dH, y = dW, z = dD — i.e. already
    # array order (this is why the reference later flips the field channels
    # before grid_sample, convex_adam_MIND.py:139).
    np.testing.assert_allclose(mesh, theirs, atol=1e-6)


@pytest.mark.parametrize("use_mxu", [False, True])
def test_coupled_convex_matches_oracle(rng, use_mxu):
    q = 1
    K = 2 * q + 1
    H, W, D = 6, 5, 7
    ssd = rng.standard_normal((K**3, H, W, D)).astype(np.float32)
    mesh = np.asarray(cost_volume.displacement_mesh(q))
    am = ssd.argmin(0)

    ours = convex.coupled_convex(
        jnp.asarray(ssd), jnp.asarray(am), jnp.asarray(mesh), use_mxu=use_mxu
    )

    # oracle: direct implementation of convex_adam_utils.py:93-109 semantics
    tssd = torch.from_numpy(ssd)
    tmesh = torch.from_numpy(mesh)
    disp = tmesh[:, torch.from_numpy(am).view(-1)].reshape(1, 3, H, W, D)
    disp_soft = F.avg_pool3d(disp, 3, padding=1, stride=1)
    for c in [0.003, 0.01, 0.03, 0.1, 0.3, 1]:
        coupled = tssd.view(K**3, -1) + c * (
            (tmesh.view(3, K**3, 1) - disp_soft.view(3, 1, -1)) ** 2
        ).sum(0)
        am2 = coupled.argmin(0)
        disp = tmesh[:, am2].reshape(1, 3, H, W, D)
        disp_soft = F.avg_pool3d(disp, 3, padding=1, stride=1)

    np.testing.assert_allclose(
        np.asarray(ours), disp_soft[0].numpy(), rtol=1e-4, atol=1e-4
    )


def test_coupled_convex_identity_costs(rng):
    """If the cost volume has its minimum at zero displacement everywhere,
    the solver must return (near) zero displacement."""
    q = 2
    K = 2 * q + 1
    mesh = np.asarray(cost_volume.displacement_mesh(q))
    dist = (mesh**2).sum(0).astype(np.float32)  # bowl centred at zero disp
    ssd = np.tile(dist[:, None, None, None], (1, 5, 5, 5))
    am = ssd.argmin(0)
    out = np.asarray(
        convex.coupled_convex(jnp.asarray(ssd), jnp.asarray(am), jnp.asarray(mesh))
    )
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_correlate_sad_matches_oracle(rng):
    """SAD metric variant (task-3 script semantics) with one smoothing pass."""
    C, H, W, D, q = 3, 5, 6, 4, 1
    K = 2 * q + 1
    fix = rng.standard_normal((C, H, W, D)).astype(np.float32)
    mov = rng.standard_normal((C, H, W, D)).astype(np.float32)
    ssd, _ = cost_volume.correlate(
        jnp.asarray(fix), jnp.asarray(mov), q, metric="sad", smooth_passes=1
    )
    tf, tm = torch.from_numpy(fix), torch.from_numpy(mov)
    tmp = F.pad(tm, (q, q, q, q, q, q))
    expected = torch.zeros(K**3, H, W, D)
    for kd in range(K):
        for kw in range(K):
            for kh in range(K):
                sl = tmp[:, kh:kh + H, kw:kw + W, kd:kd + D]
                expected[kd * K * K + kw * K + kh] = (tf - sl).abs().sum(0)
    expected = F.avg_pool3d(expected.unsqueeze(0), 3, stride=1, padding=1)[0]
    np.testing.assert_allclose(np.asarray(ssd), expected.numpy(), rtol=1e-4, atol=1e-5)


def test_streamed_coupled_convex_matches_materialized(rng):
    """correlate_coupled_streamed must be BIT-equal to the dense
    correlate + coupled_convex(use_mxu=False) composition (same per-candidate
    arithmetic, same first-min tie-breaks)."""
    from convexadam_tpu.core.convex import (
        correlate_coupled_streamed,
        coupled_convex,
    )

    C, h, w, d = 5, 8, 9, 10
    fix = jnp.asarray(rng.standard_normal((C, h, w, d)).astype(np.float32))
    mov = jnp.asarray(rng.standard_normal((C, h, w, d)).astype(np.float32))
    for metric in ("ssd", "sad"):
        for passes in (1, 2):
            ssd, am = cost_volume.correlate(
                fix, mov, 2, metric=metric, smooth_passes=passes
            )
            dense = coupled_convex(
                ssd, am, cost_volume.displacement_mesh(2), use_mxu=False
            )
            streamed = correlate_coupled_streamed(
                fix, mov, 2, metric=metric, smooth_passes=passes
            )
            np.testing.assert_array_equal(
                np.asarray(streamed), np.asarray(dense),
                err_msg=f"metric={metric} passes={passes}",
            )


def test_convex_displacement_dispatch(rng):
    """The dispatcher must stream when the dense volume would exceed the
    threshold and produce the same field either way."""
    from convexadam_tpu.core.convex import convex_displacement

    C, h, w, d = 3, 7, 8, 9
    fix = jnp.asarray(rng.standard_normal((C, h, w, d)).astype(np.float32))
    mov = jnp.asarray(rng.standard_normal((C, h, w, d)).astype(np.float32))
    dense = convex_displacement(fix, mov, 2, use_mxu=False)
    streamed = convex_displacement(fix, mov, 2, stream_threshold=1)
    np.testing.assert_array_equal(np.asarray(streamed), np.asarray(dense))


def test_cost_volume_stream_estimate_uses_padded_dims():
    """The stream-vs-dense estimate must size cost-volume temps as XLA:TPU
    actually allocates them — (8, 128)-tiled minor dims.  The unpadded
    estimate let (grid_sp=3, disp_hw=7) at 192x160x256 compile dense and
    OOM the chip (round-5 protocol run): (64, 53, 85) pads to
    (64, 56, 128), 1.59x."""
    from convexadam_tpu.core.convex import (
        COST_VOLUME_STREAM_THRESHOLD,
        _cost_volume_voxels,
    )

    assert _cost_volume_voxels((64, 53, 85), "cpu") == 64 * 53 * 85
    assert _cost_volume_voxels((64, 53, 85), "tpu") == 64 * 56 * 128
    # the class that OOM'd must now stream; the calibrated-dense (2,5)
    # class (unpadded dims at this shape) must stay dense
    est_3_7 = 15 ** 3 * _cost_volume_voxels((64, 53, 85), "tpu") * 4 * 2
    est_2_5 = 11 ** 3 * _cost_volume_voxels((96, 80, 128), "tpu") * 4 * 2
    assert est_3_7 > COST_VOLUME_STREAM_THRESHOLD
    assert est_2_5 <= COST_VOLUME_STREAM_THRESHOLD


def test_convex_displacement_tp_matches_single_device(rng):
    """The displacement-axis-sharded convex stage (SURVEY §2.6 TP row) on
    an 8-device mesh must match the exact single-device VPU form bit for
    bit — including the streamed path it is the multi-chip memory answer
    for."""
    import jax
    from jax.sharding import Mesh

    from convexadam_tpu.core.convex import (
        convex_displacement,
        convex_displacement_tp,
        correlate_coupled_streamed,
    )

    ff = jnp.asarray(rng.standard_normal((4, 10, 12, 10)).astype(np.float32))
    fm = jnp.asarray(rng.standard_normal((4, 10, 12, 10)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:8]), ("disp",))

    for q, metric, passes in ((2, "ssd", 2), (1, "sad", 1)):
        ref = convex_displacement(
            ff, fm, q, metric=metric, smooth_passes=passes, use_mxu=False
        )
        tp = convex_displacement_tp(
            ff, fm, q, mesh, metric=metric, smooth_passes=passes
        )
        np.testing.assert_array_equal(np.asarray(tp), np.asarray(ref))

    streamed = correlate_coupled_streamed(ff, fm, 2)
    tp = convex_displacement_tp(ff, fm, 2, mesh)
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(streamed))
