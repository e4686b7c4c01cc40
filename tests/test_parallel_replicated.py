"""Replicated-grid particle data parallelism on the virtual 8-device CPU mesh.

Checks the multi-chip path is numerically identical (up to fp64
reassociation) to the single-device solver — the decomposition must be an
implementation detail, never a physics change.
"""

import dataclasses

import numpy as np
import jax

from mpm_flip98a_tpu.config import MPMConfig, TransferKind
from mpm_flip98a_tpu.models import scenes
from mpm_flip98a_tpu.models.stabilized import run as run_single
from mpm_flip98a_tpu.parallel import make_mesh
from mpm_flip98a_tpu.parallel.replicated import make_run, pad_particles, shard_particles

FAST = MPMConfig(num_grids=37, dt=2e-5, num_particles_x=16, num_particles_y=32)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_replicated_matches_single_device():
    p, scene = scenes.dam_break_2d(FAST)
    mesh = make_mesh(8)
    pp = pad_particles(p, 8)
    pp = shard_particles(pp, mesh)
    run8 = make_run(scene, mesh)
    out8 = run8(pp, 50)
    out1 = run_single(pad_particles(p, 8), scene, 50)
    np.testing.assert_allclose(np.asarray(out8.x), np.asarray(out1.x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out8.v), np.asarray(out1.v), atol=1e-8)
    np.testing.assert_allclose(np.asarray(out8.J), np.asarray(out1.J), atol=1e-10)


def test_replicated_with_all_switches():
    cfg = dataclasses.replace(
        FAST, use_fbar=True, pressure_mixing_ratio=0.5, flip_blend=0.98,
        transfer=TransferKind.PIC,
    )
    p, scene = scenes.dam_break_2d(cfg)
    mesh = make_mesh(8)
    pp = shard_particles(pad_particles(p, 8), mesh)
    out8 = make_run(scene, mesh)(pp, 30)
    out1 = run_single(pad_particles(p, 8), scene, 30)
    np.testing.assert_allclose(np.asarray(out8.x), np.asarray(out1.x), atol=1e-10)


def test_padding_is_inert():
    p, scene = scenes.dam_break_2d(FAST)
    out_ref = run_single(p, scene, 25)
    out_pad = run_single(pad_particles(p, 64), scene, 25)
    np.testing.assert_allclose(
        np.asarray(out_pad.x)[: p.n], np.asarray(out_ref.x), atol=1e-12
    )
