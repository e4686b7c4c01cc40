"""Surface tension (CSF extension, general path).

Physics contract: with zero gravity, an isolated 2:1 rectangular drop
under surface tension pulls toward a circle — the principal second
moments of the particle cloud approach each other — while the sigma = 0
control stays exactly static.  (Extension beyond the reference's switch
set; see models/stabilized._csf_force.)
"""

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.config import MPMConfig, Physics
from mpm_flip98a_tpu.models import materials as mat
from mpm_flip98a_tpu.models.stabilized import Scene, WallBC, run
from mpm_flip98a_tpu.state import Particles


def _drop_scene(sigma: float):
    cfg = MPMConfig(
        dtype="float32", num_grids=41, dt=5e-5, surface_tension=sigma
    )
    physics = Physics(gravity=0.0)
    l = cfg.domain_length
    w, h = 0.22 * l, 0.11 * l
    nx, ny = 32, 16
    xs = (np.arange(nx) + 0.5) * (w / nx) + 0.5 * (l - w)
    ys = (np.arange(ny) + 0.5) * (h / ny) + 0.5 * (l - h)
    x = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    p = Particles.init(
        jnp.asarray(x, jnp.float32),
        volume0=w * h / (nx * ny),
        density=physics.particle_density,
    )
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            bulk_modulus=physics.bulk_modulus,
            dynamic_viscosity=physics.dynamic_viscosity,
        ),
        wall=WallBC("slip"),
    )
    return p, scene


def _anisotropy(x):
    c = x - x.mean(axis=0)
    ixx = (c[:, 0] ** 2).mean()
    iyy = (c[:, 1] ** 2).mean()
    return max(ixx, iyy) / max(min(ixx, iyy), 1e-30)


def test_drop_rounds_under_surface_tension():
    p0, scene = _drop_scene(sigma=5.0)
    out = run(p0, scene, 1500)
    x = np.asarray(out.x)
    assert np.isfinite(x).all()
    a0 = _anisotropy(np.asarray(p0.x))
    a1 = _anisotropy(x)
    # 2:1 rectangle starts at moment ratio ~4; tension must pull it a
    # meaningful way toward 1.
    assert a0 > 3.5
    assert a1 < 0.75 * a0, (a0, a1)
    # Drop stays compact and in the box interior.
    assert np.abs(np.asarray(out.J) - 1.0).max() < 0.2
    cfg = scene.cfg
    assert (x > 0.05 * cfg.domain_length).all()
    assert (x < 0.95 * cfg.domain_length).all()


def test_zero_sigma_control_is_static():
    p0, scene = _drop_scene(sigma=0.0)
    out = run(p0, scene, 300)
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(p0.x), atol=1e-6
    )
