"""Three-way cross-validation: C++ oracle vs NumPy oracle vs JAX solver.

The reference validates the Python solver against its C++ solver
(README.md:27-35); here all three implementations of the mls-mpm88
algorithm must agree per substep in fp32."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpm_flip98a_tpu.config import MLS88Config
from mpm_flip98a_tpu.models import mls_mpm
from mpm_flip98a_tpu.oracle import advance as np_advance, init_dam_break
from mpm_flip98a_tpu.oracle import native
from mpm_flip98a_tpu.state import MLS88Particles

CFG = MLS88Config()

# Per-field fp32 tolerances: C (and through it F's increment) carries the
# Dinv = 4/dx^2 = 25600 scale (mls-mpm88-explained.cpp:79), so its absolute
# reassociation noise is ~1e2 larger than the O(1) fields'.
TOL = {"x": 2e-5, "v": 2e-5, "F": 1e-4, "C": 5e-3, "Jp": 2e-5}


@pytest.fixture(scope="module")
def lib():
    native.build()
    return True


def test_cpp_matches_numpy_single_substep(lib):
    s = init_dam_break(n=1000, seed=0)
    for warmup in (0, 100):
        for _ in range(warmup):
            s = np_advance(s, CFG)
        got = native.advance(s, CFG, steps=1)
        ref = np_advance(s, CFG)
        for name in ("x", "v", "F", "C", "Jp"):
            err = np.abs(getattr(got, name) - getattr(ref, name)).max()
            assert err <= TOL[name], f"{name} after warmup={warmup}: {err:.2e}"


def test_cpp_matches_jax_single_substep(lib):
    s = init_dam_break(n=1000, seed=1)
    for _ in range(50):
        s = np_advance(s, CFG)
    got = native.advance(s, CFG, steps=1)
    ours = mls_mpm.make_substep(CFG)(
        MLS88Particles(
            x=jnp.asarray(s.x), v=jnp.asarray(s.v), F=jnp.asarray(s.F),
            C=jnp.asarray(s.C), Jp=jnp.asarray(s.Jp),
        )
    )
    for name in ("x", "v", "F", "C", "Jp"):
        err = np.abs(np.asarray(getattr(ours, name)) - getattr(got, name)).max()
        assert err <= TOL[name], f"{name}: {err:.2e}"


def test_cpp_multi_step_stable(lib):
    s = init_dam_break(n=1000, seed=2)
    out = native.advance(s, CFG, steps=500)
    assert np.isfinite(out.x).all()
    assert (out.x > 0).all() and (out.x < 1).all()
    assert (out.Jp >= 0.6).all() and (out.Jp <= 20.0).all()
