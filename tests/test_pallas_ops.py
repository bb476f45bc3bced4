"""Pallas kernel parity (interpreter mode on the CPU backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from convexadam_tpu.core.cost_volume import correlate
from convexadam_tpu.ops.cost_volume_pallas import (
    correlate_pallas,
    fits_vmem,
)


@pytest.mark.parametrize("q", [1, 2])
@pytest.mark.parametrize("shape", [(4, 8, 8, 8), (3, 16, 24, 10)])
def test_pallas_cost_volume_matches_xla(rng, q, shape):
    fix = rng.standard_normal(shape).astype(np.float32)
    mov = rng.standard_normal(shape).astype(np.float32)
    sp, ap = correlate_pallas(jnp.asarray(fix), jnp.asarray(mov), q, interpret=True)
    sx, ax = correlate(jnp.asarray(fix), jnp.asarray(mov), q)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ap), np.asarray(ax))


def test_vmem_guard():
    # default setting fits; a grid_sp=2-sized coarse volume does not
    assert fits_vmem((12, 32, 32, 32), 4, 4)
    assert not fits_vmem((12, 96, 96, 96), 5, 4)
