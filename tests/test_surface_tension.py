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


def _drop_scene(sigma: float, dtype="float32"):
    cfg = MPMConfig(
        dtype=dtype, num_grids=41, dt=5e-5, surface_tension=sigma
    )
    physics = Physics(gravity=0.0)
    l = cfg.domain_length
    w, h = 0.22 * l, 0.11 * l
    nx, ny = 32, 16
    xs = (np.arange(nx) + 0.5) * (w / nx) + 0.5 * (l - w)
    ys = (np.arange(ny) + 0.5) * (h / ny) + 0.5 * (l - h)
    x = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    jdt = jnp.float64 if dtype == "float64" else jnp.float32
    p = Particles.init(
        jnp.asarray(x, jdt),
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
        mass_floor=1e-8 * float(np.min(np.asarray(p.mass))),
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


def test_sharded_csf_matches_single_device():
    # Slab-sharded CSF must match single-device exactly: every radius-1
    # stage of the derivative chain halo-refreshes its outermost rows and
    # the normalization maxima ride a pmax (VERDICT r2 item 7; see
    # models/stabilized._csf_force).  The drop spans several slab
    # boundaries of the 8-shard mesh.
    from mpm_flip98a_tpu.parallel import make_mesh
    from mpm_flip98a_tpu.parallel.domain import DomainSpec, distribute, make_run

    p, scene = _drop_scene(sigma=5.0, dtype="float64")
    mesh = make_mesh(8)
    spec = DomainSpec.for_particles(scene.cfg, 8, p, headroom=2.0)
    state, perm = distribute(p, scene, spec, mesh)
    out = make_run(scene, spec, mesh)(state, 200)
    ref = run(p, scene, 200)
    assert int(np.asarray(out.dropped).sum()) == 0
    x8 = np.asarray(out.particles.x)[perm]
    np.testing.assert_allclose(x8, np.asarray(ref.x), atol=1e-12)


def test_fast_path_rejects_surface_tension():
    import pytest
    from mpm_flip98a_tpu.models import fast2d

    p, scene = _drop_scene(sigma=5.0)
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, scene.cfg, spec)
    with pytest.raises(NotImplementedError):
        fast2d.substep(b, scene)
