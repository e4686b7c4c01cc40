"""Sanity tests for the NumPy oracle (the ground-truth solver).

The oracle re-implements cpp_validation/mls-mpm88-explained.cpp; these
tests check the physics invariants that make it trustworthy as ground
truth: mass conservation, bounded positions, momentum injection by gravity,
and a stable multi-step dam-break evolution (the reference's acceptance
criterion is exactly such a stable evolution, README.md:27-35).
"""

import numpy as np

from mpm_flip98a_tpu.config import MLS88Config
from mpm_flip98a_tpu.oracle import OracleState, advance, init_dam_break

CFG = MLS88Config()


def test_initial_scene_matches_reference_block():
    s = init_dam_break(n=3000, seed=0)
    assert s.x.shape == (3000, 2)
    # Block: 0.16 x 0.16 centered at (0.13, 0.13)  (mls-mpm88-explained.cpp:194)
    assert np.all(s.x >= 0.05 - 1e-6) and np.all(s.x <= 0.21 + 1e-6)
    assert np.all(s.Jp == 1.0) and np.all(s.v == 0.0)


def test_single_substep_free_fall():
    # One lone particle far from boundaries: P2G/G2P is exact for constant
    # fields, so one substep is pure gravity free fall.
    s = OracleState(
        x=np.array([[0.5, 0.5]], np.float32),
        v=np.zeros((1, 2), np.float32),
        F=np.eye(2, dtype=np.float32)[None].copy(),
        C=np.zeros((1, 2, 2), np.float32),
        Jp=np.ones((1,), np.float32),
    )
    s2 = advance(s, CFG)
    np.testing.assert_allclose(s2.v[0], [0.0, CFG.dt * CFG.gravity], atol=1e-6)
    np.testing.assert_allclose(
        s2.x[0], [0.5, 0.5 + CFG.dt * CFG.dt * CFG.gravity], atol=1e-7
    )


def test_stable_dam_break_500_steps():
    s = init_dam_break(n=1000, seed=0)
    for _ in range(500):
        s = advance(s, CFG)
    assert np.all(np.isfinite(s.x)) and np.all(np.isfinite(s.v))
    # Particles stay inside the box (boundary band 0.05, cpp:116-128).
    assert np.all(s.x > 0.0) and np.all(s.x < 1.0)
    # The column collapses: fluid spreads right, height drops.
    assert s.x[:, 0].max() > 0.21
    # Plasticity keeps Jp in its clamp range (cpp:175).
    assert np.all(s.Jp >= 0.6) and np.all(s.Jp <= 20.0)


def test_momentum_gain_matches_gravity_before_contact():
    # Before boundary contact, total momentum change per step == N m g dt.
    # Use a block at the domain center so no stencil touches the boundary
    # band (the dam-break scene starts inside it at x = 0.05).
    rng = np.random.default_rng(1)
    x = ((rng.random((500, 2)) * 2.0 - 1.0) * 0.08 + 0.5).astype(np.float32)
    s = OracleState(
        x=x,
        v=np.zeros((500, 2), np.float32),
        F=np.broadcast_to(np.eye(2, dtype=np.float32), (500, 2, 2)).copy(),
        C=np.zeros((500, 2, 2), np.float32),
        Jp=np.ones((500,), np.float32),
    )
    s1 = advance(s, CFG)
    s2 = advance(s1, CFG)
    dp = (s2.v.sum(axis=0) - s1.v.sum(axis=0)) * CFG.mass_p
    expected = np.array([0.0, 500 * CFG.mass_p * CFG.gravity * CFG.dt])
    np.testing.assert_allclose(dp, expected, rtol=5e-3, atol=1e-4)
