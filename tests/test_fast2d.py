"""Fast Pallas-kernel path vs the general XLA stabilized solver.

The fast path must be the same physics, just faster: fp32 agreement per
substep and statistically over a collapse.  On CPU the kernels run in
Pallas interpret mode, so sizes stay small.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.config import EOSKind, MPMConfig, TransferKind
from mpm_flip98a_tpu.models import fast2d, scenes
from mpm_flip98a_tpu.models.stabilized import run as run_ref, substep as substep_ref

FAST = MPMConfig(
    dtype="float32",
    num_grids=37,
    dt=2e-5,
    num_particles_x=16,
    num_particles_y=32,
    flip_blend=0.98,
    transfer=TransferKind.PIC,
)


def _setup(cfg=FAST):
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    return p, scene, spec, b


def _dense_xy(b):
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


def test_single_substep_matches_stabilized():
    p, scene, spec, b = _setup()
    b1 = fast2d.substep(b, scene)
    p1 = substep_ref(p, scene)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b1), _ref_xy(p1)
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)
    np.testing.assert_allclose(v_f, v_r, atol=1e-4)
    assert int(b1.overflow) == 0


def test_hundred_substeps_track_stabilized():
    p, scene, spec, b = _setup()
    b_out = fast2d.run(b, scene, spec, 100)
    p_out = run_ref(p, scene, 100)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b_out), _ref_xy(p_out)
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-5)
    assert int(b_out.overflow) == 0


def test_long_collapse_stable_and_bounded():
    cfg = dataclasses.replace(FAST, dt=4e-5)
    p, scene, spec, b = _setup(cfg)
    b_out = fast2d.run(b, scene, spec, 1500)
    h = fast2d.to_host(b_out)
    x = np.stack([h["x0"], h["x1"]], axis=-1)
    assert np.isfinite(x).all()
    assert x.shape[0] == p.n
    assert (x > -cfg.dx).all() and (x < cfg.domain_length + cfg.dx).all()
    # Collapse spread, like the reference scene evolution (0.06 s of sim
    # time — the front has moved ~1/5 of a column width; the proper
    # FLIP98+PIC pairing is slightly more dissipative than the old
    # invalid FLIP+APIC config this test used to run).
    assert x[:, 0].max() > cfg.fluid_width * 1.15
    assert int(b_out.overflow) == 0


def test_multimaterial_elastic_drop_matches_stabilized():
    cfg = dataclasses.replace(FAST, dt=1e-5)
    p, scene = scenes.elastic_drop_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    b1 = fast2d.run(b, scene, spec, 50)
    p1 = run_ref(p, scene, 50)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b1), _ref_xy(p1)
    assert x_f.shape == x_r.shape
    np.testing.assert_allclose(x_f, x_r, atol=1e-6)
    np.testing.assert_allclose(v_f, v_r, atol=1e-3)
    assert int(b1.overflow) == 0


def test_flip98_with_pic_transfer_long_run_stable():
    # FLIP blending must pair with the PIC (non-affine) scatter; the
    # FLIP + APIC-affine combination double-counts the local velocity
    # field and diverges within ~0.5 s of simulated time (measured).
    cfg = dataclasses.replace(
        FAST, dt=4e-5, flip_blend=0.98, transfer=TransferKind.PIC
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.run(fast2d.from_particles(p, cfg, spec), scene, spec, 4000)
    h = fast2d.to_host(b)
    x = np.stack([h["x0"], h["x1"]], -1)
    assert np.isfinite(x).all() and x.shape[0] == p.n
    assert (x > -cfg.dx).all() and (x < cfg.domain_length + cfg.dx).all()
    assert int(b.overflow) == 0


def test_penalty_ebc_matches_stabilized():
    cfg = dataclasses.replace(FAST, use_penalty_ebc=True)
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.run(fast2d.from_particles(p, cfg, spec), scene, spec, 100)
    ref = run_ref(p, scene, 100)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b), _ref_xy(ref)
    np.testing.assert_allclose(x_f, x_r, atol=1e-5)
    assert int(b.overflow) == 0


def test_fused_fbar_mixing_tracks_stabilized_statistically():
    # The fast path fuses the F-bar / pressure projection into the transfer
    # kernels with a one-substep lag, so per-particle trajectories diverge
    # O(dt) from the two-pass general path; the ensemble must still agree.
    # The lag tightens the stable dt when BOTH stabilizers are active
    # (measured: stable at CFL ~0.15, diverges at ~0.3; each switch alone
    # is stable at ~0.3) — run at dt = 2e-5.
    cfg = dataclasses.replace(
        FAST, dt=2e-5, use_fbar=True, pressure_mixing_ratio=0.5
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.run(fast2d.from_particles(p, cfg, spec), scene, spec, 1000)
    ref = run_ref(p, scene, 1000)
    h = fast2d.to_host(b)
    x_f = np.stack([h["x0"], h["x1"]], -1)
    x_r = np.asarray(ref.x)
    assert np.isfinite(x_f).all() and x_f.shape[0] == p.n
    np.testing.assert_allclose(x_f.mean(axis=0), x_r.mean(axis=0), atol=5e-4)
    np.testing.assert_allclose(x_f.std(axis=0), x_r.std(axis=0), atol=5e-4)
    assert np.abs(h["J"] - 1.0).max() < 0.1
    assert int(b.overflow) == 0


def test_fused_fbar_mixing_stable_at_full_cfl():
    # Round-1 regression: the one-substep lag on the nodal averages halved
    # the stable dt when BOTH stabilizers were active (diverged by ~1500
    # substeps at dt = 4e-5, CFL ~0.3).  The semi-implicit lag correction
    # (advance jbar_s / p_s by their local rates) restores the full
    # stability region — this dt must now hold for a long collapse.
    cfg = dataclasses.replace(
        FAST, dt=4e-5, use_fbar=True, pressure_mixing_ratio=0.5
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.run(fast2d.from_particles(p, cfg, spec), scene, spec, 2500)
    h = fast2d.to_host(b)
    x = np.stack([h["x0"], h["x1"]], -1)
    assert np.isfinite(x).all() and x.shape[0] == p.n
    assert (x > -cfg.dx).all() and (x < cfg.domain_length + cfg.dx).all()
    assert np.abs(h["J"] - 1.0).max() < 0.2
    assert int(b.overflow) == 0


def test_fused_stabilization_first_step_matches_exactly():
    # At t = 0 the lagged averages equal their pointwise values (J = 1,
    # p = 0, div = 0), so the FIRST substep must match the general path
    # exactly even with the fused switches on.
    cfg = dataclasses.replace(FAST, use_fbar=True, pressure_mixing_ratio=0.5)
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b1 = fast2d.substep(fast2d.from_particles(p, cfg, spec), scene)
    p1 = substep_ref(p, scene)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b1), _ref_xy(p1)
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)
    np.testing.assert_allclose(v_f, v_r, atol=1e-4)


def test_rebucket_preserves_state():
    p, scene, spec, b = _setup()
    b1 = fast2d.rebucket(b, scene.cfg, spec)
    (x0, v0), (x1, v1) = _dense_xy(b), _dense_xy(b1)
    np.testing.assert_array_equal(x0, x1)
    np.testing.assert_array_equal(v0, v1)


def test_tait_eos_finite_with_dead_slots():
    # Regression (ADVICE r1): dead bucket slots are zero-filled by
    # bucket_by_row; J = 0 made the Tait power inf and 0 * inf = NaN
    # scattered into the grid.  Dead slots now carry J = 1.
    cfg = dataclasses.replace(FAST, eos=EOSKind.TAIT)
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    assert (np.asarray(b.mask) == 0).any()  # the hazard needs dead slots
    b1 = fast2d.run(b, scene, spec, 20)
    ref = run_ref(p, scene, 20)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b1), _ref_xy(ref)
    assert np.isfinite(x_f).all() and np.isfinite(v_f).all()
    np.testing.assert_allclose(x_f, x_r, atol=1e-6)
    assert int(b1.overflow) == 0


def test_single_material_corotated_finite_with_dead_slots():
    # Regression (ADVICE r1): with a single FIXED_COROTATED material the
    # dispatch runs unmasked on every slot; F = 0 in dead slots made the
    # polar normalisation 1/sqrt(0) = inf -> NaN.  Dead slots now carry
    # F = I.
    from mpm_flip98a_tpu.models import materials as mat
    from mpm_flip98a_tpu.models.stabilized import Scene

    cfg = dataclasses.replace(FAST, flip_blend=0.0, transfer=TransferKind.APIC)
    p, base = scenes.dam_break_2d(cfg, dtype=np.float32)
    e, nu = 5e4, 0.3
    scene = Scene(
        cfg=cfg,
        physics=base.physics,
        params=dataclasses.replace(
            base.params,
            mu=e / (2 * (1 + nu)),
            lam=e * nu / ((1 + nu) * (1 - 2 * nu)),
        ),
        materials_present=(mat.FIXED_COROTATED,),
    )
    p = dataclasses.replace(
        p, material=jnp.full_like(p.material, mat.FIXED_COROTATED)
    )
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    assert (np.asarray(b.mask) == 0).any()
    b1 = fast2d.run(b, scene, spec, 20)
    ref = run_ref(p, scene, 20)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b1), _ref_xy(ref)
    assert np.isfinite(x_f).all() and np.isfinite(v_f).all()
    np.testing.assert_allclose(x_f, x_r, atol=1e-6)
    assert int(b1.overflow) == 0


def test_flip_with_apic_transfer_rejected():
    import pytest

    with pytest.raises(ValueError, match="flip_blend"):
        MPMConfig(flip_blend=0.98, transfer=TransferKind.APIC)


def test_tent_kernel_matches_stabilized():
    # kernel=TENT in the fast path (VERDICT r1 missing item 6): the kernels
    # switch to hat taps and C comes from the general per-particle
    # D = sum w dpos dpos^T inverse, mirroring the general path's
    # non-B-spline branch.
    from mpm_flip98a_tpu.config import KernelKind

    cfg = dataclasses.replace(FAST, kernel=KernelKind.TENT)
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    b1 = fast2d.substep(b, scene)
    p1 = substep_ref(p, scene)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b1), _ref_xy(p1)
    np.testing.assert_allclose(x_f, x_r, atol=1e-7)
    np.testing.assert_allclose(v_f, v_r, atol=1e-4)
    # And over a collapse stretch.
    b50 = fast2d.run(b, scene, spec, 50)
    p50 = run_ref(p, scene, 50)
    (x_f, v_f), (x_r, v_r) = _dense_xy(b50), _ref_xy(p50)
    np.testing.assert_allclose(x_f, x_r, atol=1e-5)
    assert int(b50.overflow) == 0


def test_run_while_variant_bit_matches_fori(monkeypatch, request):
    """MPM_RUN_WHILE=1 (while_loop structure, rebucket cond hoisted out
    of the hot body) must execute the identical substep/rebucket
    sequence as the default fori+cond loop — bit-exact, including across
    a window long enough to trigger at least one rebucket, and with a
    kinematic collider exercising the t threading.  The knob is read at
    trace time inside jitted run(): clear caches around both traces."""
    import os

    import jax
    import pytest

    jax.clear_caches()
    request.addfinalizer(jax.clear_caches)

    p, scene, spec, b = _setup()
    monkeypatch.setenv("MPM_RUN_WHILE", "0")  # fori+cond baseline
    b_fori = fast2d.run(b, scene, spec, 300)

    monkeypatch.setenv("MPM_RUN_WHILE", "1")
    jax.clear_caches()
    b_while = fast2d.run(b, scene, spec, 300)

    hf, hw = fast2d.to_host(b_fori), fast2d.to_host(b_while)
    for k in ("x0", "x1", "v0", "v1", "J", "mass"):
        np.testing.assert_array_equal(hf[k], hw[k], err_msg=k)
    assert int(b_while.overflow) == 0

    # Kinematic collider: t must advance identically in both loops.
    pk, scenek = scenes.plow_2d(FAST, dtype=np.float32)
    speck = fast2d.FastSpec.for_particles(FAST, pk, headroom=2.0)
    bk = fast2d.from_particles(pk, FAST, speck)
    bw = fast2d.run(bk, scenek, speck, 60, t0=jnp.float32(0.0))
    monkeypatch.setenv("MPM_RUN_WHILE", "0")
    jax.clear_caches()
    bf = fast2d.run(bk, scenek, speck, 60, t0=jnp.float32(0.0))
    hf, hw = fast2d.to_host(bf), fast2d.to_host(bw)
    for k in ("x0", "x1", "v0", "v1"):
        np.testing.assert_array_equal(hf[k], hw[k], err_msg=k)
