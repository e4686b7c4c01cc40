"""Analytic invariance checks of the full pipeline.

A block in free fall (no wall contact) must translate rigidly: uniform
velocity field => APIC/FLIP transfers are exact, stress stays zero, the
shape is preserved to round-off.  This catches any asymmetry or spurious
force in P2G/grid/G2P — on both the general XLA path and the Pallas fast
path."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import fast2d, scenes
from mpm_flip98a_tpu.models.stabilized import run as run_general
from mpm_flip98a_tpu.state import Particles

CFG = MPMConfig(num_grids=37, dt=2e-5, num_particles_x=16, num_particles_y=32)


def _block(cfg, dtype=np.float64):
    # Centered block, clear of every wall for the whole test duration.
    rng = np.random.default_rng(7)
    x = (rng.random((400, 2)) * 0.08 + np.array([0.18, 0.25])).astype(dtype)
    return Particles.init(
        jnp.asarray(x), volume0=1e-6, density=997.5
    )


def test_free_fall_translates_rigidly_general():
    p, scene = scenes.dam_break_2d(CFG)
    p = _block(CFG)
    n_sub = 200
    out = run_general(p, scene, n_sub)
    t = n_sub * CFG.dt
    g = scene.physics.gravity
    # Analytic displacement: leapfrog-style accumulation of v_k = g k dt
    # gives dy = g dt^2 n(n+1)/2.
    dy = g * CFG.dt**2 * n_sub * (n_sub + 1) / 2
    np.testing.assert_allclose(
        np.asarray(out.x)[:, 1] - np.asarray(p.x)[:, 1], dy, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out.x)[:, 0], np.asarray(p.x)[:, 0], atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(out.v)[:, 1], g * t, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out.J), 1.0, atol=1e-10)


def test_free_fall_translates_rigidly_fast():
    cfg = dataclasses.replace(CFG, dtype="float32")
    _, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    p = _block(cfg, np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    n_sub = 200
    out = fast2d.run(b, scene, spec, n_sub)
    h = fast2d.to_host(out)
    g = scene.physics.gravity
    dy = g * cfg.dt**2 * n_sub * (n_sub + 1) / 2
    x0 = np.sort(np.asarray(p.x)[:, 0])
    np.testing.assert_allclose(np.sort(h["x0"]), x0, atol=1e-6)
    np.testing.assert_allclose(h["v1"], g * n_sub * cfg.dt, rtol=1e-4)
    np.testing.assert_allclose(h["J"], 1.0, atol=1e-5)
    y_disp = np.sort(h["x1"]) - np.sort(np.asarray(p.x)[:, 1])
    np.testing.assert_allclose(y_disp, dy, rtol=1e-3)
