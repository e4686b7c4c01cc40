"""Tests for the stabilized free-surface solver (the functionsConfidential
reconstruction) and its feature-switch matrix.

Strategy per SURVEY.md section 4: physics invariants (mass/momentum,
partition of unity / linear reproduction — the reference's own runtime
diagnostics, fields.py:15-18), stability of the dam-break evolution, and a
smoke pass over every feature-switch combination (config.py:18-29)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from mpm_flip98a_tpu.config import KernelKind, MPMConfig, TransferKind
from mpm_flip98a_tpu.models import materials as mat
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import Scene, WallBC, run, substep_grid, make_substep

# A small, fast config: coarse grid, bigger dt (CFL ~ 0.1), fp64.
FAST = MPMConfig(num_grids=37, dt=2e-5, num_particles_x=16, num_particles_y=32)


def fast_scene(**over):
    cfg = dataclasses.replace(FAST, **over)
    return scenes.dam_break_2d(cfg)


def test_partition_of_unity_and_linear_reproduction():
    p, scene = fast_scene()
    p2, _ = substep_grid(p, scene)
    # Quadratic B-spline: sum w = 1, sum w x_i reproduces x_p
    # (the reference's consistency diagnostics, fields.py:15-18).
    np.testing.assert_allclose(np.asarray(p2.pou), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p2.consistency), 0.0, atol=1e-12)


def test_partition_of_unity_tent():
    p, scene = fast_scene(kernel=KernelKind.TENT)
    p2, _ = substep_grid(p, scene)
    np.testing.assert_allclose(np.asarray(p2.pou), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p2.consistency), 0.0, atol=1e-12)


def test_mass_conservation_on_grid():
    p, scene = fast_scene()
    _, grid = substep_grid(p, scene)
    total_grid_mass = float(jnp.sum(grid.m[..., 0, 0]))
    total_particle_mass = float(jnp.sum(p.mass))
    np.testing.assert_allclose(total_grid_mass, total_particle_mass, rtol=1e-12)


def test_first_substep_is_free_fall():
    # From rest, v after one substep == g dt for every particle (no stress:
    # J = 1, C = 0; column rests above the bottom wall nodes' support... so
    # use the interior: particles > 2 cells from walls see pure gravity).
    p, scene = fast_scene()
    p2, _ = substep_grid(p, scene)
    interior = np.asarray(
        (p.x[:, 0] > 2 * scene.cfg.dx) & (p.x[:, 1] > 2 * scene.cfg.dx)
    )
    g_dt = scene.physics.gravity * scene.cfg.dt
    np.testing.assert_allclose(
        np.asarray(p2.v)[interior, 1], g_dt, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(p2.v)[interior, 0], 0.0, atol=1e-12)


@pytest.mark.parametrize(
    "transfer,flip",
    [
        (TransferKind.APIC, 0.0),
        (TransferKind.PIC, 0.0),
        # FLIP blend requires the PIC scatter (MPMConfig rejects FLIP+APIC).
        (TransferKind.PIC, 0.98),
    ],
)
@pytest.mark.parametrize("kernel", [KernelKind.BSPLINE, KernelKind.TENT])
def test_switch_matrix_smoke(transfer, kernel, flip):
    p, scene = fast_scene(transfer=transfer, kernel=kernel, flip_blend=flip)
    p2 = run(p, scene, 50)
    x = np.asarray(p2.x)
    assert np.all(np.isfinite(x))
    assert np.all(x > -2 * scene.cfg.dx) and np.all(x < scene.cfg.domain_length + 2 * scene.cfg.dx)


@pytest.mark.parametrize("fbar", [True, False])
@pytest.mark.parametrize("mixing", [0.0, 1.0])
@pytest.mark.parametrize("penalty", [True, False])
def test_stabilization_matrix_smoke(fbar, mixing, penalty):
    p, scene = fast_scene(
        use_fbar=fbar, pressure_mixing_ratio=mixing, use_penalty_ebc=penalty
    )
    p2 = run(p, scene, 50)
    assert np.all(np.isfinite(np.asarray(p2.x)))
    assert np.all(np.isfinite(np.asarray(p2.pressure)))


def test_dam_break_collapses_and_stays_bounded():
    # 5000 x 4e-5 s = 0.2 s of simulated time: the 0.114 m column falls
    # ~0.1 m under gravity, enough for a clear spread along the floor.
    p, scene = fast_scene(dt=4e-5)
    p2 = run(p, scene, 5000)
    x = np.asarray(p2.x)
    assert np.all(np.isfinite(x))
    # Column collapses: front advances beyond the initial width.
    assert x[:, 0].max() > scene.cfg.fluid_width * 1.5
    # Stays inside the box.
    assert np.all(x >= -scene.cfg.dx) and np.all(x <= scene.cfg.domain_length + scene.cfg.dx)
    # Near-incompressibility: J stays within a few percent.
    j = np.asarray(p2.J)
    assert np.all(j > 0.85) and np.all(j < 1.15)


def test_flip98_blend_definition():
    # alpha = 0 -> velocity is pure PIC (v == gathered grid velocity).
    # Both runs use the PIC scatter (FLIP+APIC is rejected by MPMConfig).
    p, scene = fast_scene(flip_blend=0.0, transfer=TransferKind.PIC)
    p0, _ = substep_grid(p, scene)
    # alpha = 0.98: v = 0.98 (v_old + dv) + 0.02 v_pic.  With v_old = 0,
    # reconstruct from the alpha = 0 run's PIC velocity and the deltas.
    p98_scene = Scene(
        cfg=dataclasses.replace(scene.cfg, flip_blend=0.98),
        physics=scene.physics,
        params=scene.params,
        materials_present=scene.materials_present,
        wall=scene.wall,
    )
    p98, _ = substep_grid(p, p98_scene)
    v_pic = np.asarray(p0.v)
    v_98 = np.asarray(p98.v)
    # From rest, v0 grid = 0... dv_flip = v_pic - 0 = v_pic, so
    # v_98 = 0.98 (0 + v_pic) + 0.02 v_pic = v_pic.  Positions identical.
    np.testing.assert_allclose(v_98, v_pic, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p98.x), np.asarray(p0.x), atol=1e-15)
    # After a second step from different particle velocities they diverge.
    p0b, _ = substep_grid(p0, scene)
    p98b, _ = substep_grid(p98, p98_scene)
    assert np.abs(np.asarray(p98b.v) - np.asarray(p0b.v)).max() > 0


def test_penalty_ebc_keeps_particles_inside():
    p, scene = fast_scene(use_penalty_ebc=True)
    p2 = run(p, scene, 2000)
    x = np.asarray(p2.x)
    assert np.all(np.isfinite(x))
    assert np.all(x >= -scene.cfg.dx)
    assert np.all(x <= scene.cfg.domain_length + scene.cfg.dx)


def test_multimaterial_elastic_drop():
    cfg = dataclasses.replace(FAST, dt=1e-5)
    p, scene = scenes.elastic_drop_2d(cfg)
    p2 = run(p, scene, 500)
    assert np.all(np.isfinite(np.asarray(p2.x)))
    block = np.asarray(p.material) == mat.NEO_HOOKEAN
    # The elastic block fell (gravity) but stays cohesive: J near 1.
    assert np.asarray(p2.x)[block, 1].mean() < np.asarray(p.x)[block, 1].mean()
    j_block = np.asarray(p2.J)[block]
    assert np.all(j_block > 0.5) and np.all(j_block < 1.5)


def test_3d_dam_break_smoke():
    p, scene = scenes.dam_break_3d(num_grids=24, particles_per_axis=(8, 8, 16), dt=2e-5)
    p2 = run(p, scene, 100)
    x = np.asarray(p2.x)
    assert np.all(np.isfinite(x))
    assert np.all(x >= -scene.cfg.dx)
    assert np.all(x <= scene.cfg.domain_length + scene.cfg.dx)
    # Column falls along the gravity (last) axis.
    assert x[:, 2].mean() < np.asarray(p.x)[:, 2].mean()


def test_reference_config_smoke():
    # The exact reference workload (105^2 grid, 8450 particles, f64,
    # dt = 1e-6; config.py:24-46) — a short burst.
    p, scene = scenes.dam_break_2d()
    assert p.n == 8450
    assert scene.cfg.substeps_per_frame == 10_000
    p2 = run(p, scene, 200)
    assert np.all(np.isfinite(np.asarray(p2.x)))
