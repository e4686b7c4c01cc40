"""Benchmark: particle-grid transfer throughput on the 1M-particle dam-break.

Metric (BASELINE.json): particle-grid transfer ops/sec/chip, where one
transfer op = one particle-node interaction (stencil size 3^dim) in either
direction, i.e. per substep N * 3^dim * 2 (P2G + G2P) — the same counting
used for the reference workload estimate (BASELINE.md, derived row).
Target: >= 1e9 ops/sec/chip on TPU v5e-1 (vs_baseline = value / 1e9).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N, "detail": ...}

The default full run (on TPU) measures EVERY headline metric in one
invocation — the 2D line (the headline value), the 3D full-BASELINE-scale
line, and the multichip halo-comm split (CPU-mesh subprocess) — and embeds
the secondary metrics under detail.d3 / detail.multichip so the driver's
captured artifact evidences all of them (VERDICT r2 item 2).

Env knobs:
  BENCH_SMALL=1      tiny CPU-friendly smoke configuration (2D only)
  BENCH_3D=1         run ONLY the 3D leg (8M particles, 256^3 — the full
                     BASELINE scale; BENCH_3D_SMALL=1 for 1M/128^3)
  BENCH_MULTICHIP=1  run ONLY the multichip CPU-mesh leg
  BENCH_2D_ONLY=1    skip the 3D + multichip legs
  BENCH_SUBSTEPS=n   override timed substeps (default 200)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_workload(small: bool):
    import jax.numpy as jnp

    from mpm_flip98a_tpu.config import MPMConfig, TransferKind
    from mpm_flip98a_tpu.models import scenes

    if small:
        cfg = MPMConfig(
            dtype="float32",
            num_grids=65,
            dt=1e-5,
            num_particles_x=64,
            num_particles_y=128,
            fluid_width=0.105,
            fluid_height=0.21,
            flip_blend=0.98,
            transfer=TransferKind.PIC,
        )
    else:
        # 1M particles, 512^2-cell grid, 8 particles/cell in the column
        # (the BASELINE.json 1M-particle dam-break).  Wide column: spreads
        # slot occupancy evenly across row buckets.
        cfg = MPMConfig(
            dtype="float32",
            num_grids=513,
            dt=2e-6,
            num_particles_x=2000,
            num_particles_y=500,
            fluid_width=0.430,
            fluid_height=0.215,
            flip_blend=0.98,
            transfer=TransferKind.PIC,
        )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    return p, scene


def main3d(n_sub: int):
    import jax
    import jax.numpy as jnp

    from mpm_flip98a_tpu.models import fast3d, scenes

    if os.environ.get("BENCH_3D_SMALL") == "1":
        p, scene = scenes.slab_3d()  # 1M / 128^3
    else:
        # Full BASELINE.json configs[3] scale: 8M particles, 256^3 grid.
        p, scene = scenes.slab_3d(num_grids=256, particles_per_axis=(512, 512, 32))
    spec = fast3d.FastSpec3D.for_particles(scene.cfg, p, headroom=1.5)
    b = jax.jit(lambda q: fast3d.from_particles(q, scene.cfg, spec))(p)
    b = fast3d.run(b, scene, spec, n_sub)
    float(jnp.sum(b.x0))
    t0 = time.perf_counter()
    b = fast3d.run(b, scene, spec, n_sub)
    float(jnp.sum(b.x0))
    elapsed = time.perf_counter() - t0
    assert int(np.asarray(b.overflow)) == 0
    value = p.n * 27 * 2 * n_sub / elapsed
    return {
        "metric": "particle_grid_transfer_ops_per_sec_per_chip_3d",
        "value": value,
        "unit": "ops/s",
        "vs_baseline": value / 1e9,
        "detail": {
            "particles": p.n,
            "grid": scene.cfg.num_grids,
            "substeps": n_sub,
            "elapsed_s": round(elapsed, 4),
            "backend": jax.devices()[0].platform,
        },
    }


def main_multichip(n_sub: int):
    """Sharded fast path on the virtual 8-device CPU mesh: a recorded
    scaling-sanity artifact (CPU timing is meaningless; the evidence is the
    executed decomposition + the analytic comm-volume split)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    from mpm_flip98a_tpu.config import MPMConfig, TransferKind
    from mpm_flip98a_tpu.models import fast2d, scenes
    from mpm_flip98a_tpu.parallel import make_mesh
    from mpm_flip98a_tpu.parallel import fast_domain

    n_dev = 8
    cfg = MPMConfig(
        dtype="float32", num_grids=129, dt=1e-5,
        num_particles_x=128, num_particles_y=256,
        fluid_width=0.42, fluid_height=0.21,
        flip_blend=0.98, transfer=TransferKind.PIC,
    )
    p, scene = scenes.dam_break_2d(cfg, dtype=np.float32)
    mesh = make_mesh(n_dev)
    spec = fast_domain.FastDomainSpec.for_particles(cfg, n_dev, p, headroom=2.0)
    b = fast_domain.distribute(p, cfg, spec, mesh)
    out = fast_domain.make_run(scene, spec, mesh)(b, n_sub)
    assert int(np.asarray(out.overflow).sum()) == 0
    h = fast_domain.fast2d.to_host(out)
    assert h["x0"].shape[0] == p.n and np.isfinite(h["x0"]).all()

    g = cfg.num_grids
    nch = 6
    halo_rows = 2 * (fast_domain.H_LO + fast_domain.H_HI)  # reduce + gather
    halo_bytes = halo_rows * nch * g * 4
    allreduce_bytes = 2 * nch * g * g * 4  # ring all-reduce equivalent
    return {
        "metric": "multichip_halo_comm_bytes_per_substep",
        "value": halo_bytes,
        "unit": "bytes/substep/chip",
        "vs_baseline": halo_bytes / allreduce_bytes,
        "detail": {
            "mode": "slab-sharded fast path, 8-device CPU mesh",
            "particles": p.n,
            "grid": g,
            "substeps_executed": n_sub,
            "n_shards": n_dev,
            "overflow": 0,
            "grid_allreduce_bytes_equivalent": allreduce_bytes,
            "halo_fraction_of_allreduce": round(
                halo_bytes / allreduce_bytes, 5
            ),
        },
    }


def _multichip_subprocess(n_sub: int):
    """Run the multichip CPU-mesh leg in a subprocess (it needs the CPU
    platform with 8 virtual devices, which cannot coexist with the live
    TPU backend in this process) and return its parsed JSON line."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["BENCH_MULTICHIP"] = "1"
    env["BENCH_SUBSTEPS"] = str(n_sub)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": (out.stderr or "no JSON line")[-500:]}
    except Exception as e:  # pragma: no cover - diagnostics only
        return {"error": repr(e)}


def _device_alive(timeout_s: float = 180.0) -> bool:
    """Probe the default backend with a trivial op under a watchdog.

    The remote-tunnel backend can wedge at the device-claim step (seen:
    a multi-hour infra outage where the first op blocks forever).  A
    hang here would swallow the whole bench invocation; an explicit
    error artifact is strictly better evidence."""
    import threading

    ok = []

    def probe():
        try:
            import jax.numpy as jnp

            float(jnp.sum(jnp.ones(8)))
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    n_sub = int(os.environ.get("BENCH_SUBSTEPS", "16" if small else "200"))
    if not _device_alive():
        print(json.dumps({
            "metric": "particle_grid_transfer_ops_per_sec_per_chip",
            "value": 0.0,
            "unit": "ops/s",
            "vs_baseline": 0.0,
            "detail": {
                "error": "device unreachable: first trivial op did not "
                "complete within 180 s (backend tunnel outage; rerun "
                "scripts/measure_all.sh when the chip is back)",
            },
        }))
        return
    if os.environ.get("BENCH_MULTICHIP") == "1":
        print(json.dumps(main_multichip(min(n_sub, 100))))
        return
    if os.environ.get("BENCH_3D") == "1":
        print(json.dumps(main3d(min(n_sub, 50))))
        return

    import jax
    import jax.numpy as jnp

    from mpm_flip98a_tpu.models import fast2d

    p, scene = build_workload(small)
    n = p.n
    stencil = 3 ** scene.cfg.dim

    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=1.5)
    b = fast2d.from_particles(p, scene.cfg, spec)

    # Warmup + compile with the SAME static substep count (a different
    # n_substeps is a different jit cache entry — warming with another value
    # would time compilation).  Sync by materialising a scalar on the host:
    # on remote-dispatch backends `block_until_ready` alone can return
    # before execution completes.
    b = fast2d.run(b, scene, spec, n_sub)
    float(jnp.sum(b.x0))

    t0 = time.perf_counter()
    b = fast2d.run(b, scene, spec, n_sub)
    float(jnp.sum(b.x0))
    elapsed = time.perf_counter() - t0

    assert bool(np.isfinite(np.asarray(b.x0)).all()), "non-finite state"
    assert int(np.asarray(b.overflow)) == 0, "bucket overflow"

    transfer_ops = n * stencil * 2 * n_sub
    value = transfer_ops / elapsed
    result = {
        "metric": "particle_grid_transfer_ops_per_sec_per_chip",
        "value": value,
        "unit": "ops/s",
        "vs_baseline": value / 1e9,
        "detail": {
            "particles": n,
            "grid": scene.cfg.num_grids,
            "substeps": n_sub,
            "elapsed_s": round(elapsed, 4),
            "substeps_per_s": round(n_sub / elapsed, 2),
            "wallclock_per_1k_substeps_s": round(1000 * elapsed / n_sub, 3),
            "backend": jax.devices()[0].platform,
        },
    }
    if not small and os.environ.get("BENCH_2D_ONLY") != "1":
        # Secondary headline metrics, same invocation (VERDICT r2 item 2):
        # 3D at full BASELINE scale on this chip, then the multichip
        # comm-split sanity leg on a CPU-mesh subprocess.
        result["detail"]["d3"] = main3d(min(n_sub, 50))
        result["detail"]["multichip"] = _multichip_subprocess(min(n_sub, 100))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
