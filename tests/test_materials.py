"""Material-model guards (VERDICT r3 weak #6).

The fused Pallas kernels floor J before the Tait power
(ops/pallas/transfer2d.py j_safe); the general path's
materials.fluid_pressure must apply the same guard so a transiently
non-positive J (splashy free-surface particle, momentary inversion)
cannot open a NaN channel on the general path only.
"""

import jax.numpy as jnp
import numpy as np

from mpm_flip98a_tpu.config import EOSKind
from mpm_flip98a_tpu.models import materials


def test_tait_pressure_finite_on_degenerate_j():
    params = materials.MaterialParams(eos=EOSKind.TAIT)
    j = jnp.asarray([-0.5, 0.0, 1e-9, 1e-3, 0.5, 1.0, 2.0], jnp.float32)
    p = materials.fluid_pressure(params, j)
    assert bool(jnp.isfinite(p).all())
    # Degenerate J values clamp to the same floor as the kernels -> equal
    # pressures, matching in-kernel behavior (transfer2d.py:372-373).
    p_floor = materials.fluid_pressure(params, jnp.asarray([1e-3], jnp.float32))[0]
    np.testing.assert_allclose(np.asarray(p[:4]), float(p_floor), rtol=1e-6)


def test_tait_pressure_unchanged_in_valid_range():
    params = materials.MaterialParams(eos=EOSKind.TAIT)
    j = jnp.linspace(0.9, 1.1, 32, dtype=jnp.float64)
    p = materials.fluid_pressure(params, j)
    k, g = params.bulk_modulus, params.tait_gamma
    expect = (k / g) * ((1.0 / np.asarray(j)) ** g - 1.0)
    np.testing.assert_allclose(np.asarray(p), expect, rtol=1e-12)


def test_linear_eos_untouched():
    params = materials.MaterialParams(eos=EOSKind.LINEAR)
    j = jnp.asarray([0.5, 1.0, 1.5], jnp.float32)
    p = materials.fluid_pressure(params, j)
    np.testing.assert_allclose(np.asarray(p), -2e6 * (np.asarray(j) - 1.0), rtol=1e-6)
