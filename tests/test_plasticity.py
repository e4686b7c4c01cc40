"""Snow plasticity in the PRODUCTION solvers (stabilized + both fast paths).

The reference's validation solver clamps the singular values of F after
the MLS F-update (cpp_validation/mls-mpm88-explained.cpp:164-170); the
validation models reproduce that (models/mls_mpm.py, tested in
test_mls_mpm_vs_oracle).  This file covers the PRODUCTION wiring of the
same clamp: `MaterialParams.plastic` must bound the fixed-corotated
block's principal stretches in stabilized / fast2d / fast3d, and the
fast paths must agree with the general path with the switch on.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.config import MPMConfig, TransferKind
from mpm_flip98a_tpu.models import fast2d, fast3d, scenes
from mpm_flip98a_tpu.models import materials as mat
from mpm_flip98a_tpu.models.stabilized import run as run_ref
from mpm_flip98a_tpu.ops import mathx

CFG = MPMConfig(
    dtype="float32",
    num_grids=37,
    dt=4e-5,
    num_particles_x=16,
    num_particles_y=32,
    flip_blend=0.98,
    transfer=TransferKind.PIC,
)

# Tight clamp so the modest strains of the drop scene actually engage it
# within a CPU-friendly number of substeps (the reference's 0.975/1.0075
# band needs >2.5% compression).
LO, HI = 1.0 - 5e-3, 1.0 + 1e-3


def _scene_2d(plastic: bool):
    # Block starts just above the floor with a downward impact velocity so
    # real strain builds within a CPU-friendly number of substeps (in free
    # fall F stays I and the clamp would be vacuous).
    p, scene = scenes.elastic_drop_2d(
        CFG,
        dtype=np.float32,
        block_material=mat.FIXED_COROTATED,
        plastic=plastic,
        drop_height_frac=0.02,
    )
    v = jnp.where(
        (p.material == mat.FIXED_COROTATED)[:, None],
        jnp.asarray([0.0, -1.0], p.v.dtype),
        0.0,
    )
    p = dataclasses.replace(p, v=v)
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params, sig_clamp_lo=LO, sig_clamp_hi=HI
        ),
    )
    return p, scene


def _block_sigma(f, material):
    _, sig, _ = mathx.svd(jnp.asarray(f))
    sel = np.asarray(material) == mat.FIXED_COROTATED
    return np.asarray(sig)[sel]


def test_clamp_bounds_stretches_general_path():
    p, scene = _scene_2d(plastic=True)
    p1 = run_ref(p, scene, 400)
    s = _block_sigma(p1.F, p1.material)
    assert np.isfinite(s).all()
    assert s.min() >= LO - 1e-5 and s.max() <= HI + 1e-5

    # The switch must DO something: without it the same trajectory's
    # stretches leave the clamp band.
    p0, scene0 = _scene_2d(plastic=False)
    p2 = run_ref(p0, scene0, 400)
    s2 = _block_sigma(p2.F, p2.material)
    assert s2.min() < LO - 1e-5 or s2.max() > HI + 1e-5


def test_fast2d_matches_general_with_plasticity():
    p, scene = _scene_2d(plastic=True)
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, scene.cfg, spec)
    b1 = fast2d.run(b, scene, spec, 100)
    p1 = run_ref(p, scene, 100)
    h = fast2d.to_host(b1)
    x_f = np.stack([h["x0"], h["x1"]], -1)
    x_r = np.asarray(p1.x)
    of = np.lexsort((x_f[:, 1], x_f[:, 0]))
    orr = np.lexsort((x_r[:, 1], x_r[:, 0]))
    np.testing.assert_allclose(x_f[of], x_r[orr], atol=1e-5)
    assert int(b1.overflow) == 0
    # And the clamp engaged on the fast path's own F state.
    live = np.asarray(b1.mask) > 0
    fm = np.stack(
        [
            np.stack([np.asarray(b1.F00)[live], np.asarray(b1.F01)[live]], -1),
            np.stack([np.asarray(b1.F10)[live], np.asarray(b1.F11)[live]], -1),
        ],
        -2,
    )
    s = _block_sigma(fm, np.asarray(b1.mat)[live])
    assert np.isfinite(s).all()
    assert s.min() >= LO - 1e-5 and s.max() <= HI + 1e-5


def test_fast3d_matches_general_with_plasticity():
    # Pre-strained block (F = diag(1.02, 1.0, 0.97)) so the clamp engages
    # on the very first F-update — no need to simulate until impact.
    p, scene = scenes.elastic_drop_3d(
        block_material=mat.FIXED_COROTATED, plastic=True
    )
    scene = dataclasses.replace(
        scene,
        params=dataclasses.replace(
            scene.params, sig_clamp_lo=LO, sig_clamp_hi=HI
        ),
    )
    stretch = jnp.asarray(np.diag([1.02, 1.0, 0.97]), p.F.dtype)
    f0 = jnp.where(
        (p.material == mat.FIXED_COROTATED)[:, None, None],
        stretch[None],
        p.F,
    )
    p = dataclasses.replace(p, F=f0)
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b1 = fast3d.run(fast3d.from_particles(p, scene.cfg, spec), scene, spec, 3)
    p1 = run_ref(p, scene, 3)
    h = fast3d.to_host(b1)
    x_f = np.stack([h["x0"], h["x1"], h["x2"]], -1)
    x_r = np.asarray(p1.x)
    of = np.lexsort((x_f[:, 2], x_f[:, 1], x_f[:, 0]))
    orr = np.lexsort((x_r[:, 2], x_r[:, 1], x_r[:, 0]))
    np.testing.assert_allclose(x_f[of], x_r[orr], atol=1e-6)
    assert int(b1.overflow) == 0
    # General path: clamp engaged.
    s = _block_sigma(p1.F, p1.material)
    assert s.min() >= LO - 1e-5 and s.max() <= HI + 1e-5
    # Fast path's own F state equally clamped.
    live = np.asarray(b1.mask) > 0
    fm = np.stack(
        [
            np.stack(
                [np.asarray(getattr(b1, f"F{a}{c}"))[live] for c in range(3)],
                -1,
            )
            for a in range(3)
        ],
        -2,
    )
    s_f = _block_sigma(fm, np.asarray(b1.mat)[live])
    assert s_f.min() >= LO - 1e-5 and s_f.max() <= HI + 1e-5
