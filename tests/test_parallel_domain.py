"""Slab domain decomposition on the virtual 8-device CPU mesh.

The decomposition contract: physics identical to the single-device solver
(up to fp reassociation), no particles lost, exact mass conservation —
verified with and without cross-shard migration.
"""

import dataclasses

import numpy as np
import jax

from mpm_flip98a_tpu.config import MPMConfig, TransferKind
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run as run_single
from mpm_flip98a_tpu.parallel import make_mesh
from mpm_flip98a_tpu.parallel.domain import (
    DomainSpec,
    collect,
    distribute,
    make_run,
)

FAST = MPMConfig(num_grids=37, dt=2e-5, num_particles_x=16, num_particles_y=32)


def _setup(cfg, n_shards=8):
    p, scene = scenes.dam_break_2d(cfg)
    mesh = make_mesh(n_shards)
    spec = DomainSpec.for_particles(cfg, n_shards, p, headroom=2.0)
    state, perm = distribute(p, scene, spec, mesh)
    return p, scene, mesh, spec, state, perm


def test_short_run_matches_single_device_exactly():
    # 5 substeps: no particle crosses a slab boundary, so the perm from
    # distribute() still maps input rows to shard rows.
    p, scene, mesh, spec, state, perm = _setup(FAST)
    run8 = make_run(scene, spec, mesh)
    out = run8(state, 5)
    ref = run_single(p, scene, 5)
    x8 = np.asarray(out.particles.x)[perm]
    v8 = np.asarray(out.particles.v)[perm]
    np.testing.assert_allclose(x8, np.asarray(ref.x), atol=1e-12)
    np.testing.assert_allclose(v8, np.asarray(ref.v), atol=1e-10)
    assert int(np.asarray(out.dropped).sum()) == 0


def test_long_run_with_migration_matches_single_device():
    # 0.2 s of collapse: the fluid front crosses several slab boundaries.
    cfg = dataclasses.replace(FAST, dt=4e-5)
    p, scene, mesh, spec, state, perm = _setup(cfg)
    run8 = make_run(scene, spec, mesh)
    out = run8(state, 3000)
    ref = run_single(p, scene, 3000)

    assert int(np.asarray(out.dropped).sum()) == 0
    got = collect(out)
    assert got.x.shape[0] == p.n  # every particle accounted for
    np.testing.assert_allclose(got.mass.sum(), np.asarray(ref.mass).sum(), rtol=1e-12)

    # Pair particles by lexicographic position sort; trajectories agree to
    # fp64 reassociation noise amplified by the dynamics.
    def sort_xy(x):
        order = np.lexsort((x[:, 1], x[:, 0]))
        return x[order]

    np.testing.assert_allclose(
        sort_xy(np.asarray(got.x)), sort_xy(np.asarray(ref.x)), atol=1e-6
    )


def test_migration_happened():
    cfg = dataclasses.replace(FAST, dt=4e-5)
    p, scene, mesh, spec, state, perm = _setup(cfg)
    run8 = make_run(scene, spec, mesh)
    out = run8(state, 3000)
    # Count actives per shard: the collapse spreads particles to shards that
    # started empty (the column occupies only the left-most slabs).
    mass = np.asarray(out.particles.mass).reshape(spec.n_shards, spec.capacity)
    active_per_shard = (mass > 0).sum(axis=1)
    initial = np.asarray(state.particles.mass).reshape(spec.n_shards, spec.capacity)
    initial_per_shard = (initial > 0).sum(axis=1)
    assert (active_per_shard != initial_per_shard).any()


def test_domain_with_all_switches():
    cfg = dataclasses.replace(
        FAST,
        use_fbar=True,
        pressure_mixing_ratio=0.5,
        flip_blend=0.98,
        transfer=TransferKind.PIC,
        use_penalty_ebc=True,
    )
    p, scene, mesh, spec, state, perm = _setup(cfg)
    out = make_run(scene, spec, mesh)(state, 50)
    ref = run_single(p, scene, 50)
    assert int(np.asarray(out.dropped).sum()) == 0
    np.testing.assert_allclose(
        np.asarray(out.particles.x)[perm], np.asarray(ref.x), atol=1e-10
    )


def test_domain_3d():
    p, scene = scenes.dam_break_3d(num_grids=24, particles_per_axis=(8, 8, 16), dt=2e-5)
    mesh = make_mesh(4)
    spec = DomainSpec.for_particles(scene.cfg, 4, p, headroom=2.0)
    state, perm = distribute(p, scene, spec, mesh)
    out = make_run(scene, spec, mesh)(state, 50)
    ref = run_single(p, scene, 50)
    assert int(np.asarray(out.dropped).sum()) == 0
    got = collect(out)
    assert got.x.shape[0] == p.n
    def sort_xyz(x):
        order = np.lexsort((x[:, 2], x[:, 1], x[:, 0]))
        return x[order]
    np.testing.assert_allclose(
        sort_xyz(np.asarray(got.x)), sort_xyz(np.asarray(ref.x)), atol=1e-8
    )
