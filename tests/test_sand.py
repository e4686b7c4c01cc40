"""Drucker-Prager elastoplastic sand (materials.SAND — extension).

Formulation of Klar et al. 2016 ("Drucker-Prager Elastoplasticity for
Sand Animation"): Hencky-strain St. Venant-Kirchhoff elasticity + a
non-associative return mapping projecting the log singular values of F
onto the friction cone.  Pinned here: the return mapping's case
analysis (elastic / cone projection / tip), yield-surface consistency
after projection, fast-vs-general agreement in 2D and 3D, and the
macroscopic column-collapse behavior that distinguishes sand from both
the fluid (spreads flat) and the elastic solids (stand/bounce).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.config import MPMConfig
from mpm_flip98a_tpu.models import fast2d, materials as mat, scenes
from mpm_flip98a_tpu.models.stabilized import run as run_ref, substep as substep_ref
from mpm_flip98a_tpu.ops import mathx

PARAMS = mat.MaterialParams(mu=1.0e5, lam=1.5e5, friction_angle=30.0)


def _eps_of(f):
    _, sig, _ = mathx.svd(jnp.asarray(f))
    return np.log(np.maximum(np.asarray(sig), 1e-4))


def _yield_value(eps, d):
    mu, lam = PARAMS.mu, PARAMS.lam
    alpha = mat.sand_alpha(PARAMS)
    tr = eps.sum(-1)
    ehat = eps - tr[..., None] / d
    en = np.sqrt((ehat * ehat).sum(-1))
    return en + alpha * (d * lam + 2 * mu) / (2 * mu) * tr


def test_return_mapping_cases_2d():
    rng = np.random.default_rng(0)
    # Random small-strain F's: symmetric stretches exp(eps) rotated.
    n = 512
    eps = rng.normal(scale=0.05, size=(n, 2))
    theta = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    f = rot * np.exp(eps)[:, None, :]  # R diag(exp(eps))
    f = jnp.asarray(f.astype(np.float64))

    f_new = np.asarray(mat.sand_return(PARAMS, f))
    assert np.isfinite(f_new).all()
    y_before = _yield_value(eps, 2)
    eps_after = _eps_of(f_new)

    elastic = (y_before <= 0) & (eps.sum(-1) <= 0)
    tip = eps.sum(-1) > 0
    plastic = ~elastic & ~tip
    assert elastic.any() and tip.any() and plastic.any()  # all cases hit

    # Elastic states: F bitwise unchanged (no SVD round-trip noise).
    np.testing.assert_array_equal(f_new[elastic], np.asarray(f)[elastic])
    # Tip: projected to eps = 0 (pure rotation remains).
    np.testing.assert_allclose(eps_after[tip], 0.0, atol=1e-12)
    # Cone projection: lands ON the yield surface, volume unchanged.
    np.testing.assert_allclose(
        _yield_value(eps_after[plastic], 2), 0.0, atol=1e-9
    )
    np.testing.assert_allclose(
        eps_after[plastic].sum(-1), eps[plastic].sum(-1), atol=1e-9
    )


def test_return_mapping_cases_3d():
    rng = np.random.default_rng(1)
    n = 256
    eps = rng.normal(scale=0.04, size=(n, 3))
    # Rotate diag(exp(eps)) by a random rotation (QR of a gaussian).
    q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
    f = jnp.asarray((q * np.exp(eps)[:, None, :]).astype(np.float64))
    f_new = np.asarray(mat.sand_return(PARAMS, f))
    eps_after = _eps_of(f_new)
    y_after = _yield_value(eps_after, 3)
    # Every state ends inside-or-on the cone (tol: SVD iteration noise).
    assert (y_after <= 1e-5).all()
    # Volume preserved except at the tip (expansion -> eps = 0).
    tip = eps.sum(-1) > 0
    np.testing.assert_allclose(
        eps_after[~tip].sum(-1), eps[~tip].sum(-1), atol=1e-6
    )
    np.testing.assert_allclose(eps_after[tip], 0.0, atol=1e-9)


def test_sand_stress_consistent_with_hencky():
    # tau = U (2 mu eps + lam tr I) U^T; at F = R (pure rotation) tau = 0.
    rng = np.random.default_rng(2)
    theta = rng.uniform(0, 2 * np.pi, 16)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    v0 = jnp.ones((16,), jnp.float64)
    tau = np.asarray(mat.sand_tau_hat(PARAMS, v0, jnp.asarray(rot)))
    np.testing.assert_allclose(tau, 0.0, atol=1e-9)
    # Pure volumetric stretch: tau = (2 mu + d lam) log(s) I.
    sc = 1.05
    f_iso = jnp.asarray(np.eye(2)[None] * sc)
    tau_iso = np.asarray(mat.sand_tau_hat(PARAMS, v0[:1], f_iso))[0]
    want = (2 * PARAMS.mu + 2 * PARAMS.lam) * np.log(sc)
    np.testing.assert_allclose(tau_iso, want * np.eye(2), rtol=1e-9)


def _column_scene(dtype="float32"):
    cfg = MPMConfig(dtype=dtype, num_grids=37, dt=5e-5)
    return scenes.sand_column_2d(
        cfg,
        dtype=np.float32 if dtype == "float32" else np.float64,
        particles_per_axis=(12, 30),
    )


def _sorted_xy(x):
    return x[np.lexsort((x[:, 1], x[:, 0]))]


def test_sand_fast_matches_general_2d():
    p, scene = _column_scene()
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, scene.cfg, spec)
    b1 = fast2d.substep(b, scene)
    p1 = substep_ref(p, scene)
    h = fast2d.to_host(b1)
    x_f = _sorted_xy(np.stack([h["x0"], h["x1"]], -1))
    x_r = _sorted_xy(np.asarray(p1.x))
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)

    b100 = fast2d.run(b, scene, spec, 100)
    p100 = run_ref(p, scene, 100)
    h = fast2d.to_host(b100)
    np.testing.assert_allclose(
        _sorted_xy(np.stack([h["x0"], h["x1"]], -1)),
        _sorted_xy(np.asarray(p100.x)),
        atol=1e-5,
    )
    assert int(b100.overflow) == 0


def test_sand_fast_matches_general_3d():
    from mpm_flip98a_tpu.models import fast3d

    p, scene = scenes.slab_3d(
        num_grids=16, particles_per_axis=(8, 8, 6), dt=2e-5,
        height_frac=0.3, flip_blend=0.0,
    )
    p = dataclasses.replace(
        p, material=jnp.full((p.n,), mat.SAND, jnp.int32)
    )
    scene = dataclasses.replace(
        scene,
        params=PARAMS,
        materials_present=(mat.SAND,),
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    b20 = fast3d.run(b, scene, spec, 20)
    p20 = run_ref(p, scene, 20)
    h = fast3d.to_host(b20)
    x_f = np.stack([h["x0"], h["x1"], h["x2"]], -1)
    x_r = np.asarray(p20.x)
    order_f = np.lexsort((x_f[:, 2], x_f[:, 1], x_f[:, 0]))
    order_r = np.lexsort((x_r[:, 2], x_r[:, 1], x_r[:, 0]))
    np.testing.assert_allclose(x_f[order_f], x_r[order_r], atol=1e-5)


def test_sand_column_collapse_is_friction_governed():
    # Macroscopic behavior: the column slumps into a pile whose height/
    # spread are SET BY THE FRICTION ANGLE — low-friction sand runs out
    # nearly flat, high-friction sand keeps a steep pile.  (Measured on
    # this scene: phi 15/30/45 deg -> h 0.040/0.046/0.058, w
    # 0.41/0.33/0.24.)  This is the behavior neither the fluid (no
    # friction) nor the elastic solids (no flow) can produce.
    cfg = MPMConfig(dtype="float32", num_grids=37, dt=5e-5)

    def settle(phi):
        p, scene = scenes.sand_column_2d(
            cfg, dtype=np.float32, particles_per_axis=(12, 30),
            friction_angle=phi,
        )
        out = run_ref(p, scene, 4000)
        x = np.asarray(out.x)
        assert np.isfinite(x).all()
        l = scene.cfg.domain_length
        assert (x > -scene.cfg.dx).all() and (x < l + scene.cfg.dx).all()
        assert x[:, 1].max() < 0.5 * np.asarray(p.x)[:, 1].max()  # slumped
        return x[:, 1].max(), np.ptp(x[:, 0])

    h_lo, w_lo = settle(15.0)
    h_hi, w_hi = settle(45.0)
    assert h_hi > 1.2 * h_lo      # steeper pile at higher friction
    assert w_hi < 0.8 * w_lo      # narrower run-out at higher friction


def test_sand_sharded_matches_single():
    # The sharded fast path runs the same substep code — sand's stress
    # and cone projection must survive slab sharding + migration intact.
    from mpm_flip98a_tpu.parallel import make_mesh
    from mpm_flip98a_tpu.parallel.fast_domain import (
        FastDomainSpec,
        distribute,
        make_run,
    )

    p, scene = _column_scene()
    mesh = make_mesh(4)
    spec = FastDomainSpec.for_particles(scene.cfg, 4, p, headroom=2.0)
    b = distribute(p, scene.cfg, spec, mesh)
    out = make_run(scene, spec, mesh)(b, 50)
    spec1 = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=2.0)
    ref = fast2d.run(
        fast2d.from_particles(p, scene.cfg, spec1), scene, spec1, 50
    )
    h, hr = fast2d.to_host(out), fast2d.to_host(ref)
    np.testing.assert_allclose(
        _sorted_xy(np.stack([h["x0"], h["x1"]], -1)),
        _sorted_xy(np.stack([hr["x0"], hr["x1"]], -1)),
        atol=1e-5,
    )
    assert int(np.asarray(out.overflow).sum()) == 0
