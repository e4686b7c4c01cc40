"""Surface tension (CSF extension; general path + both fast paths).

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


def _fast_xy(b):
    from mpm_flip98a_tpu.models import fast2d

    h = fast2d.to_host(b)
    x = np.stack([h["x0"], h["x1"]], axis=-1)
    v = np.stack([h["v0"], h["v1"]], axis=-1)
    order = np.lexsort((x[:, 1], x[:, 0]))
    return x[order], v[order]


def _ref_xy(p):
    x = np.asarray(p.x)
    v = np.asarray(p.v)
    order = np.lexsort((x[:, 1], x[:, 0]))
    return x[order], v[order]


def test_fast_path_csf_matches_general():
    """CSF on the fast path (VERDICT r3 item 5): same grid-side force on
    the (R, G) planes, so a single substep matches the general path at
    fp32 transfer tolerance, and the rounding dynamics agree
    statistically over many substeps."""
    from mpm_flip98a_tpu.models import fast2d

    p, scene = _drop_scene(sigma=5.0)
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, scene.cfg, spec)
    from mpm_flip98a_tpu.models.stabilized import substep as substep_ref

    b1 = fast2d.substep(b, scene)
    p1 = substep_ref(p, scene)
    (x_f, v_f), (x_r, v_r) = _fast_xy(b1), _ref_xy(p1)
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)
    np.testing.assert_allclose(v_f, v_r, atol=1e-4)

    out_f = fast2d.run(b, scene, spec, 600)
    out_r = run(p, scene, 600)
    x_f = _fast_xy(out_f)[0]
    x_r = _ref_xy(out_r)[0]
    a_f, a_r = _anisotropy(x_f), _anisotropy(x_r)
    assert abs(a_f - a_r) < 0.15 * a_r, (a_f, a_r)
    np.testing.assert_allclose(x_f.mean(0), x_r.mean(0), atol=5e-4)
    np.testing.assert_allclose(x_f.std(0), x_r.std(0), atol=5e-4)
    assert int(out_f.overflow) == 0


def _drop_scene_3d(sigma: float):
    """Small 3D 2:1:1 drop, zero gravity."""
    cfg = MPMConfig(
        dim=3, dtype="float32", num_grids=16, dt=5e-5, surface_tension=sigma
    )
    physics = Physics(gravity=0.0)
    l = cfg.domain_length
    w, h = 0.3 * l, 0.15 * l
    n = (12, 6, 6)
    axes = [
        (np.arange(n[a]) + 0.5) * ((w if a == 0 else h) / n[a])
        + 0.5 * (l - (w if a == 0 else h))
        for a in range(3)
    ]
    x = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    p = Particles.init(
        jnp.asarray(x, jnp.float32),
        volume0=w * h * h / (n[0] * n[1] * n[2]),
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


def test_fast3d_csf_matches_general():
    """3D fast-path CSF (VERDICT r3 item 5): one substep matches the
    general path at fp32 transfer tolerance."""
    from mpm_flip98a_tpu.models import fast3d
    from mpm_flip98a_tpu.models.stabilized import substep as substep_ref

    p, scene = _drop_scene_3d(sigma=5.0)
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    b1 = fast3d.substep(b, scene, spec)
    p1 = substep_ref(p, scene)
    h = fast3d.to_host(b1)
    x_f = np.stack([h["x0"], h["x1"], h["x2"]], axis=-1)
    v_f = np.stack([h["v0"], h["v1"], h["v2"]], axis=-1)
    x_r, v_r = np.asarray(p1.x), np.asarray(p1.v)

    def _sorted3(x):
        return np.lexsort((x[:, 2], x[:, 1], x[:, 0]))

    of, orr = _sorted3(x_f), _sorted3(x_r)
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f[of], x_r[orr], atol=1e-7)
    np.testing.assert_allclose(v_f[of], v_r[orr], atol=1e-4)

    out = fast3d.run(b, scene, spec, 30)
    h = fast3d.to_host(out)
    assert np.isfinite(h["x0"]).all()
    assert int(out.overflow) == 0


def test_sharded_fast3d_csf_matches_single_fast():
    """1-axis slab-sharded 3D fast path with CSF: gather-only halo refresh
    through the curvature chain (short horizon, fp32 noise only)."""
    from mpm_flip98a_tpu.models import fast3d
    from mpm_flip98a_tpu.parallel import make_mesh
    from mpm_flip98a_tpu.parallel import fast_domain3d

    p, scene = _drop_scene_3d(sigma=5.0)
    cfg = scene.cfg
    n_dev = 4
    mesh = make_mesh(n_dev)
    spec = fast_domain3d.FastDomain3DSpec.for_particles(cfg, n_dev, p, headroom=2.0)
    b4 = fast_domain3d.distribute(p, cfg, spec, mesh)
    out4 = fast_domain3d.make_run(scene, spec, mesh)(b4, 10)
    assert int(np.asarray(out4.overflow).sum()) == 0

    sspec = fast3d.FastSpec3D(
        rows0=spec.n_shards0 * spec.rows_per_shard0,
        rows1=spec.rows_per_shard1,
        capacity=spec.local_spec.capacity,
    )
    b1 = fast3d.from_particles(p, cfg, sspec)
    out1 = fast3d.run(b1, scene, sspec, 10)
    h4, h1 = fast3d.to_host(out4), fast3d.to_host(out1)

    def _s(h):
        x = np.stack([h["x0"], h["x1"], h["x2"]], -1)
        return x[np.lexsort((x[:, 2], x[:, 1], x[:, 0]))]

    x4, x1 = _s(h4), _s(h1)
    assert x4.shape == x1.shape
    np.testing.assert_allclose(x4, x1, atol=1e-5)


def test_sharded_fast_csf_matches_single_fast():
    """Slab-sharded fast-path CSF (gather-only halo refresh on the fold
    buffer) must match the single-device fast path."""
    from mpm_flip98a_tpu.models import fast2d
    from mpm_flip98a_tpu.parallel import make_mesh
    from mpm_flip98a_tpu.parallel import fast_domain

    p, scene = _drop_scene(sigma=5.0)
    cfg = scene.cfg
    n_dev = 8
    mesh = make_mesh(n_dev)
    spec = fast_domain.FastDomainSpec.for_particles(cfg, n_dev, p, headroom=2.0)
    b8 = fast_domain.distribute(p, cfg, spec, mesh)
    run8 = fast_domain.make_run(scene, spec, mesh)
    sspec = fast2d.FastSpec(rows=spec.n_shards * spec.rows_per_shard,
                            capacity=spec.capacity)
    b1 = fast2d.from_particles(p, cfg, sspec)

    # Short horizon: near-exact (fp32 summation-order noise only).
    out8 = run8(b8, 50)
    out1 = fast2d.run(b1, scene, sspec, 50)
    assert int(np.asarray(out8.overflow).sum()) == 0
    x8, x1 = _fast_xy(out8)[0], _fast_xy(out1)[0]
    assert x8.shape == x1.shape
    np.testing.assert_allclose(x8, x1, atol=1e-5)

    # Long horizon: fp32 trajectories decay chaotically (the CSF
    # curvature chain amplifies last-ulp differences); judge by ensemble
    # statistics, the repo-wide convention for long fp32 comparisons.
    out8 = run8(b8, 300)
    out1 = fast2d.run(b1, scene, sspec, 300)
    assert int(np.asarray(out8.overflow).sum()) == 0
    x8, x1 = _fast_xy(out8)[0], _fast_xy(out1)[0]
    np.testing.assert_allclose(x8.mean(0), x1.mean(0), atol=5e-4)
    np.testing.assert_allclose(x8.std(0), x1.std(0), atol=5e-4)
