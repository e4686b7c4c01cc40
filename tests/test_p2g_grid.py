"""Direct unit tests for the rolling-scratch fused P2G+fold+update kernels
(transfer2d.p2g_grid / transfer3d.p2g3d_grid) against the unfused
pipeline (p2g -> fold_rows -> _grid_update2d and the 3D analogue).

The end-to-end agreement suites (test_fast2d/test_fast3d) exercise the
same kernels through whole substeps; these tests pin the parts a physics
comparison can miss: the padded-layout row mapping (out row j = target
row j - 1 on every axis) and EXACT zeros in the pad rows (uninitialized
VMEM garbage there would flow into G2P edge gathers as 0 * NaN = NaN).

Tolerances: the fused kernel folds per-bucket (bucket-major add order)
while fold_rows sums shift-major, so values agree to fp32 reassociation
noise, not bit-exactly.
"""

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.models import fast2d, fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import PAD
from mpm_flip98a_tpu.ops.pallas import transfer2d as tk
from mpm_flip98a_tpu.ops.pallas import transfer3d as tk3


def _setup2d(**cfg_kwargs):
    from mpm_flip98a_tpu.config import MPMConfig, TransferKind

    cfg = MPMConfig(
        dtype="float32", num_grids=33, dt=1e-5,
        num_particles_x=24, num_particles_y=48,
        fluid_width=0.105, fluid_height=0.21,
        flip_blend=0.98, transfer=TransferKind.PIC, **cfg_kwargs,
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    gx0 = b.x0 * jnp.float32(cfg.inv_dx) + jnp.float32(PAD)
    gx1 = b.x1 * jnp.float32(cfg.inv_dx) + jnp.float32(PAD)
    return b, scene, counts, gx0, gx1


def test_p2g_grid_fused_matches_unfused_pipeline():
    b, scene, counts, gx0, gx1 = _setup2d()
    cfg = scene.cfg
    g, dx = cfg.num_grids, float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    sdata = jnp.stack(
        [gx0, gx1, b.v0, b.v1, b.C00, b.C01, b.C10, b.C11,
         b.J, b.mass, b.vol0], axis=1)
    kw = dict(
        tent=False, apic=False, eos="tait",
        kb=float(scene.params.bulk_modulus),
        mu=float(scene.params.dynamic_viscosity),
        gamma=float(scene.params.tait_gamma), fa=float(-cfg.dt * dinv),
    )
    fusedg = tk.p2g_grid(sdata, counts, g, dx, fused=True, **kw,
                         dt=float(cfg.dt), gx_=0.0,
                         gy_=float(cfg.gravity_acceleration(scene.physics)[1]),
                         floor=float(scene.mass_floor), lo=int(PAD),
                         hi=g - 1 - int(PAD), wall=scene.wall.kind, beta=0.0)
    expanded = tk.p2g_fused(sdata, counts, g, dx, **kw)
    ref = fast2d._grid_update2d(
        tk.fold_rows(expanded), scene, False, None, None
    )
    r = b.shape[0]
    assert fusedg.shape == (r + 4, ref.shape[1], g)
    # Interior: out row j = target row j - 1.
    np.testing.assert_allclose(
        np.asarray(fusedg[1 : r + 1]), np.asarray(ref), atol=1e-6
    )
    # Pads: EXACT zeros (row 0 = target -1, rows r+1..r+3 = targets >= r).
    assert not np.asarray(fusedg[0]).any()
    assert not np.asarray(fusedg[r + 1 :]).any()


def test_p2g_grid_pdata_ext_matches_unfused_pipeline():
    # Generic prepped-pdata mode with the extended stabilizer channels
    # (F-bar + pressure mixing): exercises the ext nodal averages and the
    # ext defaults (Jbar = 1 on empty nodes) in the fused finalize.
    b, scene, counts, gx0, gx1 = _setup2d(
        use_fbar=True, pressure_mixing_ratio=0.5,
    )
    cfg = scene.cfg
    g, dx = cfg.num_grids, float(cfg.dx)
    m = b.mass * b.mask
    z = jnp.zeros_like(b.C00)
    kb = jnp.float32(scene.params.bulk_modulus)
    gamma = jnp.float32(scene.params.tait_gamma)
    j_safe = jnp.maximum(b.J, jnp.float32(1e-3))
    p_point = (kb / gamma) * ((1.0 / j_safe) ** gamma - 1.0)
    v0m = b.vol0 * b.mask
    pdata = jnp.stack(
        [gx0, gx1, m * b.v0, m * b.v1, z, z, z, z, z, z, z, z, m,
         v0m * b.J, v0m, v0m * p_point, v0m * (b.C00 + b.C11)], axis=1,
    )  # (R, 17, K) ext channel layout
    fusedg = fast2d._p2g_grid(
        pdata, counts, scene, fused=False, tent=False, apic=False
    )
    expanded = tk.p2g(pdata, counts, g, dx, tent=False, apic=False)
    ref = fast2d._grid_update2d(
        tk.fold_rows(expanded), scene, True, None, None
    )
    r = b.shape[0]
    assert fusedg.shape[1] == tk.G2P_CH_EXT
    np.testing.assert_allclose(
        np.asarray(fusedg[1 : r + 1]), np.asarray(ref), atol=1e-6
    )
    # Ext pads are zero too: Jbar's empty-node default (1.0) applies only
    # to interior target rows; pad rows must stay 0 for the G2P gathers.
    assert not np.asarray(fusedg[0]).any()
    assert not np.asarray(fusedg[r + 1 :]).any()


def test_p2g_grid_raw_matches_fold_rows_halo():
    # Sharded-path contract: raw mode == fold_rows_halo(p2g) bit-for-layout
    # (UNcropped halo rows, row j = target j - 1), values to fp32
    # reassociation noise.
    b, scene, counts, gx0, gx1 = _setup2d()
    cfg = scene.cfg
    g, dx = cfg.num_grids, float(cfg.dx)
    m = b.mass * b.mask
    z = jnp.zeros_like(b.C00)
    pdata = jnp.stack(
        [gx0, gx1, m * b.v0, m * b.v1, z, z, z, z, z, z, z, z, m,
         b.vol0 * b.J * b.mask], axis=1,
    )  # (R, 14, K)
    raw = tk.p2g_grid(
        pdata, counts, g, dx, fused=False, tent=False, apic=False, raw=True
    )
    ref = tk.fold_rows_halo(tk.p2g(pdata, counts, g, dx, apic=False))
    assert raw.shape == ref.shape == (b.shape[0] + 4, tk.P2G_CH, g)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=1e-6)


def test_p2g3d_grid_raw_matches_fold_halo():
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5,
        dtype=np.float32,
    )
    cfg = scene.cfg
    spec = fast3d.FastSpec3D.for_particles(cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, cfg, spec)
    r0, r1, k = spec.rows0, spec.rows1, spec.capacity
    g, dx = cfg.num_grids, float(cfg.dx)
    shaped = lambda a: a.reshape(r0, r1, k)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    invf, padf = jnp.float32(cfg.inv_dx), jnp.float32(PAD)
    m = b.mass * b.mask
    z = jnp.zeros_like(b.C00)
    fields = (
        shaped(b.x0 * invf + padf), shaped(b.x1 * invf + padf),
        shaped(b.x2 * invf + padf),
        shaped(m * b.v0), shaped(m * b.v1), shaped(m * b.v2),
        *(shaped(z) for _ in range(9)),
        shaped(m),
    )
    raw = tk3.p2g3d_grid(
        fields, counts, r1, g, dx, apic=False, raw=True
    )
    ref = tk3.fold_rows0_halo(
        tk3.p2g3d(fields, counts, r1, g, dx, apic=False, halo1=True)
    )
    assert raw.shape == ref.shape == (r0 + 4, r1 + 4, tk3.P2G_CH, g)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=1e-6)


def test_p2g3d_grid_matches_unfused_pipeline():
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5,
        dtype=np.float32,
    )
    cfg = scene.cfg
    spec = fast3d.FastSpec3D.for_particles(cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, cfg, spec)
    r0, r1, k = spec.rows0, spec.rows1, spec.capacity
    g, dx = cfg.num_grids, float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    shaped = lambda a: a.reshape(r0, r1, k)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    invf, padf = jnp.float32(cfg.inv_dx), jnp.float32(PAD)
    cmat = [getattr(b, f"C{a}{c}") for a in range(3) for c in range(3)]
    fields = (
        shaped(b.x0 * invf + padf), shaped(b.x1 * invf + padf),
        shaped(b.x2 * invf + padf),
        shaped(b.v0), shaped(b.v1), shaped(b.v2),
        *(shaped(c) for c in cmat),
        shaped(b.J), shaped(b.mass), shaped(b.vol0),
    )
    kw = dict(
        apic=False, stress="tait",
        kb=float(scene.params.bulk_modulus),
        mu=float(scene.params.dynamic_viscosity),
        gamma=float(scene.params.tait_gamma), fa=float(-cfg.dt * dinv),
    )
    grav = tuple(float(x) for x in cfg.gravity_acceleration(scene.physics))
    fusedg = tk3.p2g3d_grid(
        fields, counts, r1, g, dx, **kw,
        dt=float(cfg.dt), grav=grav, floor=float(scene.mass_floor),
        lo=int(PAD), hi=g - 1 - int(PAD), wall=scene.wall.kind, beta=0.0,
    )
    expanded = tk3.p2g3d(fields, counts, r1, g, dx, **kw)
    ref = fast3d._grid_update(tk3.fold_rows0(expanded), scene, ext=False)
    assert fusedg.shape == (r0 + 4, r1 + 4, tk3.G2P_CH, g)
    np.testing.assert_allclose(
        np.asarray(fusedg[1 : r0 + 1, 1 : r1 + 1]), np.asarray(ref),
        atol=1e-6,
    )
    # All four pad faces exactly zero.
    f = np.asarray(fusedg)
    assert not f[0].any() and not f[r0 + 1 :].any()
    assert not f[:, 0].any() and not f[:, r1 + 1 :].any()
