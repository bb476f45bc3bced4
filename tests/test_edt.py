"""Native EDT vs scipy parity."""

import numpy as np
import pytest

scipy_edt = pytest.importorskip("scipy.ndimage").distance_transform_edt


@pytest.fixture(scope="module")
def native():
    try:
        from convexadam_tpu.native import edt
    except Exception as e:  # toolchain missing → skip
        pytest.skip(f"native edt unavailable: {e}")
    return edt


def _random_mask(rng, shape=(20, 22, 18), p=0.7):
    return (rng.random(shape) < p).astype(np.uint8)


def test_distance_matches_scipy(native, rng):
    for seed in range(3):
        m = _random_mask(np.random.default_rng(seed))
        ours = native.distance(m)
        theirs = scipy_edt(m)
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_nearest_indices_are_valid_sites(native, rng):
    """Indices must point at zero voxels achieving the exact minimal
    distance (site choice may differ from scipy on ties)."""
    m = _random_mask(rng)
    idx = native.nearest_indices(m)
    dist = native.distance(m)
    H, W, D = m.shape
    gh, gw, gd = np.meshgrid(
        np.arange(H), np.arange(W), np.arange(D), indexing="ij"
    )
    # pointed-at voxels are zero (sites)
    assert np.all(m[idx[0], idx[1], idx[2]] == 0)
    # distance to the pointed-at site equals the distance map
    d2 = (idx[0] - gh) ** 2 + (idx[1] - gw) ** 2 + (idx[2] - gd) ** 2
    np.testing.assert_allclose(np.sqrt(d2), dist, atol=1e-4)
    # zero voxels map to themselves
    zeros = m == 0
    assert np.all(idx[0][zeros] == gh[zeros])
    assert np.all(idx[1][zeros] == gw[zeros])
    assert np.all(idx[2][zeros] == gd[zeros])


def test_all_foreground_maps_to_self(native):
    m = np.ones((6, 6, 6), np.uint8)
    idx = native.nearest_indices(m)
    gh, gw, gd = np.meshgrid(
        np.arange(6), np.arange(6), np.arange(6), indexing="ij"
    )
    np.testing.assert_array_equal(idx[0], gh)
    np.testing.assert_array_equal(idx[1], gw)
    np.testing.assert_array_equal(idx[2], gd)


def test_hd95_with_native_backend(native, rng, monkeypatch):
    """metrics.hd95 must give identical results with the native EDT."""
    from convexadam_tpu.core import metrics
    from convexadam_tpu.utils import edt as edt_mod

    a = np.zeros((20, 20, 20), np.int32)
    b = np.zeros((20, 20, 20), np.int32)
    a[5:10, 5:15, 5:15] = 1
    b[8:13, 5:15, 5:15] = 1

    # monkeypatch (not bare assignment) so a failure cannot leak the forced
    # backend into the rest of the session
    monkeypatch.setattr(edt_mod, "_native", False)  # force scipy
    ref = metrics.hd95(a, b, 1)
    monkeypatch.setattr(edt_mod, "_native", native)  # force native
    ours = metrics.hd95(a, b, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ---------------------------------------------------------------------------
# On-device jump-flood EDT + HD95 (core/edt.py)
# ---------------------------------------------------------------------------

def test_jump_flood_matches_scipy(rng):
    """The 1+JFA+1 squared EDT must be exact vs scipy on random seed sets
    at several densities (measured: zero mismatching voxels)."""
    import jax.numpy as jnp
    from scipy.ndimage import distance_transform_edt

    from convexadam_tpu.core.edt import jump_flood_sqdist

    for density in (0.002, 0.02, 0.08):
        m = rng.random((24, 20, 18)) < density
        if m.sum() == 0:
            m[3, 4, 5] = True
        d2 = np.asarray(jump_flood_sqdist(jnp.asarray(m)))
        ref = np.round(distance_transform_edt(~m) ** 2)
        assert (np.abs(d2 - ref) > 0.5).sum() == 0


def test_hd95_device_matches_host(rng):
    """hd95_device must reproduce the host scipy/C++-EDT hd95 (reference
    semantics, convexAdam_hyper_util.py:32-51) including the interpolated
    percentile and the missing-label -> 30 rule."""
    import jax.numpy as jnp
    from scipy.ndimage import uniform_filter

    from convexadam_tpu.core.edt import hd95_device
    from convexadam_tpu.core.metrics import hd95

    def labels(seed):
        v = uniform_filter(
            np.random.default_rng(seed)
            .standard_normal((24, 22, 20)).astype(np.float32), 5
        )
        return np.digitize(v, np.quantile(v, [0.2, 0.4, 0.6, 0.8])).astype(
            np.int32
        )

    s1, s2 = labels(0), labels(1)
    host = hd95(s1, s2, 4)
    dev = np.asarray(hd95_device(jnp.asarray(s1), jnp.asarray(s2), 4))
    np.testing.assert_allclose(dev, host, atol=1e-5)

    # label 3 removed from one volume → missing_value; and label_chunk must
    # not change values (padding labels are discarded)
    s1z = s1.copy()
    s1z[s1z == 3] = 2
    host = hd95(s1z, s2, 4)
    dev = np.asarray(
        hd95_device(jnp.asarray(s1z), jnp.asarray(s2), 4, label_chunk=3)
    )
    assert dev[2] == 30.0
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_hd95_device_sized_exact_caps(rng):
    """hd95_device_sized must size its buffers from BOTH volumes so nothing
    truncates — including a 1-voxel-thick label whose OUTER shell exceeds
    its inner surface (inner-count-only sizing under-sizes there)."""
    import jax.numpy as jnp

    from convexadam_tpu.core.edt import (
        hd95_device_sized,
        label_buffers,
        suggest_hd95_caps,
        surface_lists,
    )
    from convexadam_tpu.core.metrics import hd95

    s1 = rng.integers(0, 3, (16, 18, 20)).astype(np.int32)
    s2 = rng.integers(0, 3, (16, 18, 20)).astype(np.int32)
    # label 3: a 1-voxel-thick sheet (outer shell ~2x inner surface)
    s1[8, 2:16, 2:18] = 3
    s2[9, 2:16, 2:18] = 3

    host = hd95(s1, s2, 3)
    dev = np.asarray(hd95_device_sized(s1, s2, 3))
    np.testing.assert_allclose(dev, host, atol=1e-5)

    # the suggested caps must cover every actual buffer occupancy exactly
    groups, global_cap = suggest_hd95_caps(s1, s2, 3)
    caps = [0] * 4
    for labs, k in groups:
        for lab in labs:
            caps[lab] = k
    pre = surface_lists(jnp.asarray(s1), jnp.asarray(s2), 3, global_cap)
    bufs = label_buffers(pre, 3, tuple(caps))
    for lab in range(1, 4):
        for n in (
            bufs.n_inner_f[lab], bufs.n_inner_m[lab],
            bufs.n_outer_f[lab], bufs.n_outer_m[lab],
        ):
            assert int(n) <= caps[lab]
    # a label missing from one volume still scores missing_value
    s2z = s2.copy()
    s2z[s2z == 2] = 1
    host = hd95(s1, s2z, 3)
    dev = np.asarray(hd95_device_sized(s1, s2z, 3))
    assert dev[1] == 30.0
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_label_buffers_partition_matches_numpy(rng):
    """label_buffers must hold, per label, the inner surface voxels ordered
    [inside-other-mask | outside] (raster within each segment) and the
    deduplicated outer-shell voxels — including cap truncation (inside
    segment first)."""
    import jax.numpy as jnp

    from convexadam_tpu.core.edt import label_buffers, surface_lists

    L = 3
    shape = (9, 10, 11)
    s1 = rng.integers(0, L + 1, shape).astype(np.int32)
    s2 = rng.integers(0, L + 1, shape).astype(np.int32)

    pre = surface_lists(jnp.asarray(s1), jnp.asarray(s2), L)
    caps = (0, 16, 5, 16)  # label 2 truncated
    bufs = label_buffers(pre, L, caps)
    offs = np.cumsum([0] + list(caps))[:-1]

    # numpy oracle: global surface list in raster order
    def surf(seg):
        nb = []
        for ax in range(3):
            for sh in (1, -1):
                r = np.roll(seg, sh, ax)
                sl = [slice(None)] * 3
                sl[ax] = slice(0, 1) if sh == 1 else slice(-1, None)
                r[tuple(sl)] = seg[tuple(sl)]
                nb.append(r)
        nb = np.stack(nb)
        diff = (nb != seg[None]).any(0)
        idx = np.flatnonzero(diff.reshape(-1))
        coords = np.stack(np.unravel_index(idx, shape))  # (3, n)
        own = seg.reshape(-1)[idx]
        nbl = nb.reshape(6, -1)[:, idx]
        return coords, own, nbl, idx

    for seg, other, inner_b, outer_b, n_inside_b in (
        (s1, s2, np.asarray(bufs.inner_f), np.asarray(bufs.outer_f),
         np.asarray(bufs.n_inside_f)),
        (s2, s1, np.asarray(bufs.inner_m), np.asarray(bufs.outer_m),
         np.asarray(bufs.n_inside_m)),
    ):
        coords, own, nbl, idx = surf(seg)
        inside = other.reshape(-1)[idx] == own
        for lab in range(1, L + 1):
            cap = caps[lab]
            sel = own == lab
            exp_in = np.concatenate(
                [coords[:, sel & inside], coords[:, sel & ~inside]], axis=1
            )[:, :cap]
            assert n_inside_b[lab] == (sel & inside).sum()
            got = inner_b[:, offs[lab]:offs[lab] + cap]
            n = exp_in.shape[1]
            np.testing.assert_array_equal(got[:, :n], exp_in)
            assert (got[:, n:] == 8192.0).all()
            osel = (own != lab) & (nbl == lab).any(0)
            exp_out = coords[:, osel][:, :cap]
            m = exp_out.shape[1]
            got_o = outer_b[:, offs[lab]:offs[lab] + cap]
            np.testing.assert_array_equal(got_o[:, :m], exp_out)
            assert (got_o[:, m:] == 8192.0).all()


def test_hd95_device_through_pallas_kernels_matches_host(rng, monkeypatch):
    """Route hd95_device's searches through the interpret-mode Pallas
    kernels (incl. the chunked vmap-of-kernel path) — values must still
    equal the host EDT loop.  On real TPU this is the default dispatch;
    this test pins it without the chip."""
    import jax.numpy as jnp
    from scipy.ndimage import uniform_filter

    import convexadam_tpu.core.edt as edt
    from convexadam_tpu.core.metrics import hd95
    from convexadam_tpu.ops.edt_pallas import (
        nearest_sq_dual_pallas_batchable,
        nearest_sq_pallas_batchable,
    )

    monkeypatch.setattr(
        edt, "_nearest_sq",
        lambda q, t, chunk=None, coords_bf16_exact=False, n_query=None,
        n_target=None: nearest_sq_pallas_batchable(
            q, t, n_query, n_target, interpret=True
        ),
    )
    monkeypatch.setattr(
        edt, "_nearest_sq_dual",
        lambda q, t, coords_bf16_exact=False, n_query=None, n_target=None,
        head_query=None, head_target=None: nearest_sq_dual_pallas_batchable(
            q, t, n_query, n_target, head_query, head_target, interpret=True
        ),
    )

    def labels(seed):
        v = uniform_filter(
            np.random.default_rng(seed)
            .standard_normal((18, 20, 22)).astype(np.float32), 5
        )
        return np.digitize(v, np.quantile(v, [0.3, 0.6, 0.85])).astype(
            np.int32
        )

    s1, s2 = labels(0), labels(1)
    host = hd95(s1, s2, 3)
    # max_surface multiple of 128 (the kernels' block picker needs clean
    # shapes; the engine's buckets are multiples of 4096) and large enough
    # to hold every label surface
    dev = np.asarray(
        edt.hd95_device(
            jnp.asarray(s1), jnp.asarray(s2), 3, label_chunk=3,
            max_surface=4096,
        )
    )
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_caps_overflow_flags_truncation(rng):
    """caps_overflow must fire when a label surface outgrows its cap or the
    global list truncates, and stay quiet on generous caps (VERDICT r3
    weak#2: sweeps must not truncate silently)."""
    import jax.numpy as jnp

    from convexadam_tpu.core.edt import (
        caps_overflow,
        label_buffers,
        surface_lists,
    )

    s1 = rng.integers(0, 3, (12, 12, 12)).astype(np.int32)
    s2 = rng.integers(0, 3, (12, 12, 12)).astype(np.int32)

    pre = surface_lists(jnp.asarray(s1), jnp.asarray(s2), 2)
    generous = (0, 2048, 2048)
    tiny = (0, 8, 8)
    assert not bool(caps_overflow(pre, label_buffers(pre, 2, generous), generous))
    assert bool(caps_overflow(pre, label_buffers(pre, 2, tiny), tiny))

    # global-list truncation alone must also flag (per-label counts are
    # then computed from a truncated list and cannot be trusted)
    pre_small = surface_lists(jnp.asarray(s1), jnp.asarray(s2), 2, 64)
    bufs = label_buffers(pre_small, 2, generous)
    assert bool(caps_overflow(pre_small, bufs, generous))


def test_hd95_device_through_pruned_kernel_matches_host(rng, monkeypatch):
    """Route hd95_from_buffers through the bucketed-grid PRUNED search
    (interpret mode) — the TPU default dispatch since round 5 — and check
    values still equal the host EDT loop exactly."""
    import jax.numpy as jnp
    from scipy.ndimage import uniform_filter

    import convexadam_tpu.core.edt as edt
    from convexadam_tpu.core.metrics import hd95

    monkeypatch.setattr(edt, "_pruned_search_enabled", lambda K: True)
    monkeypatch.setattr(edt, "_nearest_sq_pruned", _pruned_interp)

    def labels(seed):
        v = uniform_filter(
            np.random.default_rng(seed)
            .standard_normal((18, 20, 22)).astype(np.float32), 5
        )
        return np.digitize(v, np.quantile(v, [0.3, 0.6, 0.85])).astype(
            np.int32
        )

    s1, s2 = labels(0), labels(1)
    host = hd95(s1, s2, 3)
    dev = np.asarray(
        edt.hd95_device(
            jnp.asarray(s1), jnp.asarray(s2), 3, label_chunk=3,
            max_surface=4096,
        )
    )
    np.testing.assert_allclose(dev, host, atol=1e-5)


def _pruned_interp(q, t, lo, hi, nt, bf16ok):
    from convexadam_tpu.ops.edt_pallas import (
        nearest_sq_pruned_pallas_batchable,
    )

    return nearest_sq_pruned_pallas_batchable(
        q, t, lo, hi, nt, coords_bf16_exact=bf16ok, interpret=True
    )
