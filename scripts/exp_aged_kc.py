"""Occupancy-fix sweep on the aged (mid-collapse) end-to-end state.

exp_aged_state.py measured (docs/measurements/r5_exp_aged_state.log):
fresh 0.066 ms/substep (14 rows occupied, max/row 650, capacity 1024)
vs aged 0.210 (100 rows, max/row 368) with rebucket firing only 1/10k —
the 3.2x is PURE per-row kernel work: every occupied row runs its full
1024-slot chunk at ~1/3 occupancy.  Two candidate production fixes,
both sweepable here without re-aging per leg:

  KC sweep   — MPM_KC2D in {1024, 512, 256, 128}: finer chunks let the
               packed-count skip (`j*kc < counts[i]`) trim dead slots
               at kc granularity.  (At the 1M bench scale rows are
               full, so small KC only adds per-chunk fixed cost —
               2048 won there; the optimum is occupancy-dependent.)
  respec     — rebucket into a capacity sized from CURRENT occupancy
               (headroom 1.5, here 368*1.5 -> 640): what a driver-side
               between-frame re-spec would buy (one recompile per new
               capacity).

Run on a live chip:
    PYTHONPATH=.:/root/.axon_site python scripts/exp_aged_kc.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mpm_flip98a_tpu.config import MPMConfig  # noqa: E402
from mpm_flip98a_tpu.models import fast2d, scenes  # noqa: E402

AGE_SUB = int(os.environ.get("EXP_AGE_SUB", "700000"))
N_SUB = int(os.environ.get("EXP_NSUB", "10000"))


def timed(make_fn, b, n_sub, reps=2):
    f = jax.jit(make_fn)
    out = f(b)
    float(jnp.sum(out.x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(b)
        float(jnp.sum(out.x0))
        best = min(best, (time.perf_counter() - t0) / n_sub)
    return best


def occupancy(b):
    counts = np.asarray(jnp.sum((b.mask > 0).astype(jnp.int32), axis=1))
    return int((counts > 0).sum()), int(counts.max())


def leg_pair(tag, b, scene, spec):
    def fori1(st):
        return jax.lax.fori_loop(
            0, N_SUB, lambda i, s: fast2d.substep(s, scene), st
        )

    jax.clear_caches()
    dt_f = timed(fori1, b, N_SUB)
    jax.clear_caches()
    dt_w = timed(lambda st: fast2d.run(st, scene, spec, N_SUB), b, N_SUB)
    print(
        f"[{tag}] fori1 {dt_f * 1e3:7.4f}  while_d {dt_w * 1e3:7.4f}"
        f" ms/substep",
        flush=True,
    )


def main():
    p, scene = scenes.dam_break_2d(MPMConfig(), dtype=np.float32)
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=1.5)
    b = fast2d.from_particles(p, scene.cfg, spec)

    aged = b
    done = 0
    t0 = time.perf_counter()
    while done < AGE_SUB:
        step = min(10_000, AGE_SUB - done)
        aged = fast2d.run(aged, scene, spec, step)
        done += step
    float(jnp.sum(aged.x0))
    rows, mx = occupancy(aged)
    print(
        f"aged {AGE_SUB} in {time.perf_counter() - t0:.1f} s; "
        f"rows {rows}/{spec.rows} max/row {mx} cap {spec.capacity}",
        flush=True,
    )

    for kc in (1024, 512, 256, 128):
        os.environ["MPM_KC2D"] = str(kc)
        leg_pair(f"aged kc={kc}", aged, scene, spec)
    os.environ.pop("MPM_KC2D", None)

    # respec leg: capacity from CURRENT occupancy, default chunking
    cap = max(128, -(-int(1.5 * mx) // 128) * 128)
    if cap > 1024:
        nc = -(-cap // 1024)
        cap = -(-cap // (128 * nc)) * (128 * nc)
    spec2 = fast2d.FastSpec(rows=spec.rows, capacity=cap)
    b2 = fast2d.rebucket(aged, scene.cfg, spec2)
    assert int(b2.overflow) == int(aged.overflow), "respec overflow"
    print(f"respec capacity {spec.capacity} -> {cap}", flush=True)
    leg_pair(f"aged respec cap={cap}", b2, scene, spec2)

    # respec + fine kc combined
    os.environ["MPM_KC2D"] = "128"
    leg_pair(f"aged respec cap={cap} kc=128", b2, scene, spec2)
    os.environ.pop("MPM_KC2D", None)

    print("EXP AGED KC DONE", flush=True)


if __name__ == "__main__":
    main()
