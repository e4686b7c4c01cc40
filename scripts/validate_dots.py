"""Validate the in-kernel dot precision mode on the REAL TPU backend.

The round-2 postmortem (docs/PERF.md) requires any change to the kernel
matmul precision to re-run this protocol before it counts:

  1. Partition-of-unity probe: G2P of an all-ones grid field must return
     weight sums == 1 per particle; count |sum - 1| > 1e-5 violations
     (DEFAULT precision showed 34k/41k violations up to 1.7e-3).
  2. Fused-vs-general tap: one substep of the fast path vs the general
     XLA stabilized path on the same scene; report max position /
     velocity deltas.
  3. Long-horizon stability: 500-substep 64^3 multimaterial elastic-drop
     scene; must stay finite with bounded |v| and zero overflow.

Usage:  MPM_DOT_MODE=bf16x3 python scripts/validate_dots.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax

if os.environ.get("MPM_VALIDATE_CPU") == "1":
    # CPU smoke mode (interpret-mode kernels): checks the harness logic
    # only — it does NOT validate the TPU lowering (see module docstring).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, ".")

from mpm_flip98a_tpu.config import MPMConfig, TransferKind
from mpm_flip98a_tpu.models import fast2d, fast3d, scenes
from mpm_flip98a_tpu.models.stabilized import PAD, substep as substep_ref
from mpm_flip98a_tpu.ops.pallas import transfer2d as tk


def pou_probe():
    """G2P weight sums over an all-ones grid: should be exactly 1."""
    cfg = MPMConfig(
        dtype="float32", num_grids=257, dt=1e-5,
        num_particles_x=512, num_particles_y=256,
        fluid_width=0.42, fluid_height=0.21,
        flip_blend=0.98, transfer=TransferKind.PIC,
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    r, k = b.x0.shape
    inv_dx = jnp.float32(cfg.inv_dx)
    gx0 = b.x0 * inv_dx + jnp.float32(PAD)
    gx1 = b.x1 * inv_dx + jnp.float32(PAD)
    pdata2 = jnp.stack([gx0, gx1, b.mask], axis=1)  # (R, 3, K)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    grid4 = jnp.ones((r, 4, cfg.num_grids), jnp.float32)
    out = jax.jit(
        lambda pd, c, g: tk.g2p(pd, c, g, dx=float(cfg.dx), dinv=1.0)
    )(pdata2, counts, grid4)
    # channel 0 = sum_w * 1 over the ones grid
    s = np.asarray(out[:, 0, :])
    mask = np.asarray(b.mask) > 0
    err = np.abs(s[mask] - 1.0)
    n_viol = int((err > 1e-5).sum())
    print(
        f"PoU probe: n={mask.sum()} max|sum_w-1|={err.max():.3e} "
        f"violations(>1e-5)={n_viol}", flush=True,
    )
    return n_viol == 0, float(err.max())


def crop_probe():
    """Lane-width crop (fast2d.kernel_cols) ON THE REAL TPU: p2g/g2p at
    num_grids - 1 columns must agree with the uncropped width on shared
    columns (to bf16x3 reassociation level), with an exactly-zero dropped
    column, and the PoU must hold through a cropped gather.  Interpret
    mode hid BOTH previous silent-wrong-answer TPU bugs (default-precision
    dots, the fold miscompile), so the crop counts as validated only
    after this passes on hardware."""
    rng = np.random.default_rng(0)
    r, k, g = 32, 512, 129
    counts = np.full((r,), k // 2, np.int32)
    gx0 = (
        np.repeat(np.arange(r, dtype=np.float32)[:, None], k, 1)
        + rng.uniform(0.45, 0.55, (r, k)).astype(np.float32)
    )
    gx1 = rng.uniform(float(PAD), float(g - 1 - PAD), (r, k)).astype(np.float32)
    maskk = (np.arange(k)[None, None, :] < counts[:, None, None]).astype(np.float32)
    vals = rng.normal(size=(r, 12, k)).astype(np.float32) * maskk
    pdata = jnp.asarray(np.concatenate([gx0[:, None], gx1[:, None], vals], axis=1))
    cj = jnp.asarray(counts)
    full = np.asarray(tk.p2g(pdata, cj, g, 1.0))
    crop = np.asarray(tk.p2g(pdata, cj, g - 1, 1.0))
    scale = np.abs(full).max()
    d_p2g = np.abs(crop - full[..., : g - 1]).max() / scale
    last = np.abs(full[..., g - 1]).max()

    pdata2 = jnp.asarray(
        np.concatenate([gx0[:, None], gx1[:, None], maskk[:, :1]], axis=1)
    )
    grid = rng.normal(size=(r, 4, g)).astype(np.float32)
    grid[..., g - 1] = 0.0
    gfull = np.asarray(tk.g2p(pdata2, cj, jnp.asarray(grid), 1.0, 4.0))
    gcrop = np.asarray(tk.g2p(pdata2, cj, jnp.asarray(grid[..., : g - 1]), 1.0, 4.0))
    d_g2p = np.abs(gcrop - gfull).max() / np.abs(gfull).max()

    ones = jnp.ones((r, 4, g - 1), jnp.float32)
    pou = np.asarray(tk.g2p(pdata2, cj, ones, 1.0, 1.0))[:, 0, :]
    # Interior rows only: edge-row particles tap the zero row padding, so
    # their weight sums are legitimately < 1 in this synthetic setup.
    inner = slice(2, r - 3)
    pou_err = np.abs(
        pou[inner][np.asarray(maskk[inner, 0]) > 0] - 1.0
    ).max()
    print(
        f"crop probe: rel|p2g crop-full|={d_p2g:.3e} last-col={last:.3e} "
        f"rel|g2p crop-full|={d_g2p:.3e} cropped-PoU err={pou_err:.3e}",
        flush=True,
    )
    ok = d_p2g < 1e-4 and last == 0.0 and d_g2p < 1e-4 and pou_err < 1e-5
    return ok, float(max(d_p2g, d_g2p))


def tap_2d():
    cfg = MPMConfig(
        dtype="float32", num_grids=65, dt=1e-5,
        num_particles_x=64, num_particles_y=128,
        fluid_width=0.105, fluid_height=0.21,
        flip_blend=0.98, transfer=TransferKind.PIC,
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    b1 = fast2d.substep(b, scene)
    p1 = substep_ref(p, scene)
    h = fast2d.to_host(b1)
    x_f = np.stack([h["x0"], h["x1"]], -1)
    v_f = np.stack([h["v0"], h["v1"]], -1)
    of = np.lexsort((x_f[:, 1], x_f[:, 0]))
    xr = np.asarray(p1.x)
    vr = np.asarray(p1.v)
    orr = np.lexsort((xr[:, 1], xr[:, 0]))
    dx_max = np.abs(x_f[of] - xr[orr]).max()
    dv_max = np.abs(v_f[of] - vr[orr]).max()
    print(f"tap 2D fused-vs-general: |dx|max={dx_max:.3e} |dv|max={dv_max:.3e}",
          flush=True)
    return dx_max < 1e-6 and dv_max < 1e-3, (float(dx_max), float(dv_max))


def collider_tap_2d():
    """In-kernel collider epilogue on the REAL TPU (VERDICT r4 item 6):
    one substep of dam2d_obstacle on the fast path vs the general path —
    static sphere, then a kinematic (moving-center) collider at t=0.02 s.
    Single-substep agreement must stay at fp32 roundoff (~1e-6); the
    collider kernels landed after the last round-4 chip window and
    interpret-mode green has twice failed to imply TPU green here."""
    cfg = MPMConfig(
        dtype="float32", num_grids=65, dt=1e-5,
        num_particles_x=64, num_particles_y=128,
        fluid_width=0.105, fluid_height=0.21,
        flip_blend=0.98, transfer=TransferKind.PIC,
    )
    results = []
    for name, maker, t in (
        ("static", lambda: scenes.dam_break_obstacle_2d(
            cfg, dtype=np.float32, center_frac=(0.35, 0.10)), None),
        ("kinematic", lambda: scenes.plow_2d(
            cfg, dtype=np.float32), 0.02),
    ):
        p, scene = maker()
        spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
        b = fast2d.from_particles(p, cfg, spec)
        tj = None if t is None else jnp.float32(t)
        b1 = fast2d.substep(b, scene, t=tj)
        p1 = substep_ref(p, scene, t=tj)
        h = fast2d.to_host(b1)
        x_f = np.stack([h["x0"], h["x1"]], -1)
        v_f = np.stack([h["v0"], h["v1"]], -1)
        of = np.lexsort((x_f[:, 1], x_f[:, 0]))
        xr = np.asarray(p1.x)
        vr = np.asarray(p1.v)
        orr = np.lexsort((xr[:, 1], xr[:, 0]))
        dx_max = np.abs(x_f[of] - xr[orr]).max()
        dv_max = np.abs(v_f[of] - vr[orr]).max()
        print(
            f"collider tap 2D [{name}]: |dx|max={dx_max:.3e} "
            f"|dv|max={dv_max:.3e}", flush=True,
        )
        results.append(dx_max < 1e-6 and dv_max < 1e-3)
    return all(results), 0.0


def collider_tap_3d():
    """3D in-kernel collider epilogue (transfer3d._p2g3d_grid_kernel) vs
    the general path: one substep of dam3d_obstacle."""
    p, scene = scenes.dam_break_obstacle_3d(
        num_grids=32, particles_per_axis=(12, 12, 20), dt=2e-5,
        dtype=np.float32,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    b1 = fast3d.substep(b, scene, spec)
    p1 = substep_ref(p, scene)
    h = fast3d.to_host(b1)
    x_f = np.stack([h["x0"], h["x1"], h["x2"]], -1)
    of = np.lexsort((x_f[:, 2], x_f[:, 1], x_f[:, 0]))
    xr = np.asarray(p1.x)
    orr = np.lexsort((xr[:, 2], xr[:, 1], xr[:, 0]))
    dx_max = np.abs(x_f[of] - xr[orr]).max()
    print(f"collider tap 3D: |dx|max={dx_max:.3e}", flush=True)
    return dx_max < 1e-6, float(dx_max)


def collider_stability_2d(n_total=400):
    """A few hundred substeps of dam2d_obstacle on the fast path, on
    chip: finite, bounded |v|, zero overflow (VERDICT item 6's
    'run dam2d_obstacle on chip' leg, sized for a short window)."""
    # dt scales with the grid: the G=65 bench-small config runs 1e-5;
    # G=129 halves dx, so stay at 5e-6 (1e-4 exploded within 100
    # substeps on the CPU smoke — CFL, not a kernel bug).
    cfg = MPMConfig(
        dtype="float32", num_grids=129, dt=5e-6,
        num_particles_x=128, num_particles_y=256,
        fluid_width=0.105, fluid_height=0.21,
        flip_blend=0.98, transfer=TransferKind.PIC,
    )
    p, scene = scenes.dam_break_obstacle_2d(
        cfg, dtype=np.float32, center_frac=(0.35, 0.10))
    spec = fast2d.FastSpec.for_particles(cfg, p, headroom=2.0)
    b = fast2d.from_particles(p, cfg, spec)
    ok = True
    vmax = 0.0
    for done in range(100, n_total + 1, 100):
        b = fast2d.run(b, scene, spec, 100, t0=jnp.float32((done - 100) * cfg.dt))
        h = fast2d.to_host(b)
        fin = bool(np.isfinite(h["x0"]).all() and np.isfinite(h["v0"]).all())
        vmax = max(np.abs(h[k]).max() for k in ("v0", "v1"))
        ovf = int(np.asarray(b.overflow))
        print(
            f"obstacle2d substep {done}: finite={fin} |v|max={vmax:.4g} "
            f"overflow={ovf}", flush=True,
        )
        if not fin or ovf != 0 or vmax > 10.0:
            ok = False
            break
    return ok, float(vmax)


def tap_3d():
    """3D fused single-fluid path (p2g3d_grid rolling-scratch kernel) vs
    the general XLA stabilized path, one substep on the real backend."""
    p, scene = scenes.dam_break_3d(
        num_grids=32, particles_per_axis=(12, 12, 20), dt=2e-5,
        dtype=np.float32,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    b = fast3d.from_particles(p, scene.cfg, spec)
    b1 = fast3d.substep(b, scene, spec)
    p1 = substep_ref(p, scene)
    h = fast3d.to_host(b1)
    x_f = np.stack([h["x0"], h["x1"], h["x2"]], -1)
    of = np.lexsort((x_f[:, 2], x_f[:, 1], x_f[:, 0]))
    xr = np.asarray(p1.x)
    orr = np.lexsort((xr[:, 2], xr[:, 1], xr[:, 0]))
    dx_max = np.abs(x_f[of] - xr[orr]).max()
    print(f"tap 3D fused-vs-general: |dx|max={dx_max:.3e}", flush=True)
    return dx_max < 1e-6, float(dx_max)


def stability_3d_fluid(n_total=500):
    """500 substeps of the 64^3 single-fluid slab on the fused
    p2g3d_grid path: finite, bounded |v|, zero overflow."""
    p, scene = scenes.slab_3d(num_grids=64, particles_per_axis=(64, 64, 16))
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=2.0)
    bb = fast3d.from_particles(p, scene.cfg, spec)
    ok = True
    vmax = 0.0
    for done in range(100, n_total + 1, 100):
        bb = fast3d.run(bb, scene, spec, 100)
        h = fast3d.to_host(bb)
        fin = bool(
            np.isfinite(h["x0"]).all() and np.isfinite(h["v0"]).all()
        )
        vmax = max(np.abs(h[k]).max() for k in ("v0", "v1", "v2"))
        ovf = int(np.asarray(bb.overflow))
        print(
            f"3D fluid substep {done}: finite={fin} "
            f"|J-1|max={np.abs(h['J']-1).max():.4g} |v|max={vmax:.4g} "
            f"overflow={ovf}", flush=True,
        )
        if not fin or ovf != 0 or vmax > 10.0:
            ok = False
            break
    return ok, float(vmax)


def stability_3d(n_total=500):
    p, scene = scenes.elastic_drop_3d(
        num_grids=64, fluid_particles=(48, 48, 16), block_particles=(16, 16, 16),
        dt=1e-5,
    )
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p)
    b = fast3d.from_particles(p, scene.cfg, spec)
    bb = b
    done = 0
    ok = True
    vmax = 0.0
    for n in (100, 100, 100, 100, 100):
        if done >= n_total:
            break
        bb = fast3d.run(bb, scene, spec, n)
        done += n
        h = fast3d.to_host(bb)
        x = np.stack([h["x0"], h["x1"], h["x2"]], -1)
        fin = bool(np.isfinite(x).all() and np.isfinite(h["v0"]).all())
        vmax = max(np.abs(h[k]).max() for k in ("v0", "v1", "v2"))
        ovf = int(np.asarray(bb.overflow))
        print(
            f"3D substep {done}: finite={fin} |J-1|max={np.abs(h['J']-1).max():.4g}"
            f" |v|max={vmax:.4g} overflow={ovf}", flush=True,
        )
        if not fin or ovf != 0 or vmax > 10.0:
            ok = False
            break
    return ok, float(vmax)


def main():
    mode = os.environ.get("MPM_DOT_MODE", "bf16x3")
    print(f"backend={jax.default_backend()} MPM_DOT_MODE={mode}", flush=True)
    ok1, pou = pou_probe()
    ok6, crop = crop_probe()
    ok2, tap = tap_2d()
    ok7, ctap = collider_tap_2d()
    ok8, ctap3 = collider_tap_3d()
    ok4, tap3 = tap_3d()
    ok9, cvmax = collider_stability_2d()
    ok5, vmaxf = stability_3d_fluid()
    ok3, vmax = stability_3d()
    print(
        f"RESULT mode={mode} pou_ok={ok1} crop_ok={ok6} tap_ok={ok2} "
        f"collider2d_ok={ok7} collider3d_ok={ok8} collider_stable_ok={ok9} "
        f"tap3d_ok={ok4} fluid_stable_ok={ok5} stable_ok={ok3}", flush=True,
    )
    sys.exit(
        0 if (ok1 and ok2 and ok3 and ok4 and ok5 and ok6 and ok7 and ok8
              and ok9) else 1
    )


if __name__ == "__main__":
    main()
