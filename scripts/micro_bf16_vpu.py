"""VPU bf16-packing microbenchmark — the gate for ROADMAP round-4
lever 10 (packed-bf16 W build).

The 2D P2G kernel is VPU-bound at G = 512: the (K, G) column-weight
build (`transfer2d._col_weights`: sub, abs, 2x max-vs-const, 3x mul,
1x sub ≈ 8 elementwise ops) plus epilogue dominates, not the MXU
(docs/PERF.md round 3/4 budgets).  IF Mosaic issues bf16 elementwise
ops packed 2-per-lane, rebuilding W in exact-by-construction bf16
hi/lo pieces would halve that floor.  This script measures exactly
that: the same op mix, same element count, fp32 vs bfloat16, on the
real chip.  Decision rule: bf16/f32 speedup >= 1.6x -> build the
packed-W kernel variant; <= 1.2x -> the lever is dead, record it in
docs/ROADMAP.md and stop.

Also times a pure multiply-add chain (the FMA-able half of the mix)
since packing behaviour can differ between min/max compares and FMAs.

Device ops run on the MAIN thread (worker-thread-only jax use aborts at
teardown and wedges the tunnel for the next client — probe_tpu.py
docstring); bound a suspected wedge with an outer `timeout` and gate
with scripts/probe_tpu.py, as measure_all.sh does.

Usage: python scripts/micro_bf16_vpu.py
Prints one JSON line: {"wmix_f32": ops/s, "wmix_bf16": ..., "ratio_wmix": ...,
"fma_f32": ..., "fma_bf16": ..., "ratio_fma": ...}
"""

import json
import os
import time

SUB, LANE = 256, 512   # block: 8 sublane tiles x 4 lane tiles (f32)
# Env knobs so the CPU smoke test (interpret mode) stays cheap.
PROGS = int(os.environ.get("MICRO_PROGS", "64"))    # grid programs/call
REPS = int(os.environ.get("MICRO_REPS", "64"))      # in-kernel repeats
N_TIME = int(os.environ.get("MICRO_NTIME", "30"))   # timed calls


def _build_fns():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def wmix_kernel(x_ref, o_ref):
        # The _col_weights op mix (transfer2d.py:147-159), REPS times with
        # a serial dependency through `acc` so nothing folds away.
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for r in range(REPS):
            d = x - (acc * 0.0078125 + 0.5)   # depend on acc
            a = jnp.abs(d)
            t1 = jnp.maximum(1.5 - a, 0.0)
            t2 = jnp.maximum(0.5 - a, 0.0)
            acc = 0.5 * t1 * t1 - 1.5 * t2 * t2
        o_ref[...] = acc

    def fma_kernel(x_ref, o_ref):
        # Pure mul-add chain: 2 ops/element/rep, FMA-able.
        x = x_ref[...]
        acc = x
        for _ in range(REPS):
            acc = acc * x + 0.25
        o_ref[...] = acc

    interpret = jax.default_backend() == "cpu"  # CPU smoke test only

    def make(kernel, dtype):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(PROGS,),
                in_specs=[pl.BlockSpec((SUB, LANE), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((PROGS * SUB, LANE), dtype),
                interpret=interpret,
            )(x)

        return run

    return jnp, make, wmix_kernel, fma_kernel


def _measure(results: dict):
    jnp, make, wmix_kernel, fma_kernel = _build_fns()
    elems = PROGS * SUB * LANE * REPS

    for name, kernel, ops_per in (
        ("wmix", wmix_kernel, 8),
        ("fma", fma_kernel, 2),
    ):
        for dtype_name in ("f32", "bf16"):
            dtype = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
            x = (
                jnp.linspace(-2.0, 2.0, PROGS * SUB * LANE)
                .reshape(PROGS * SUB, LANE)
                .astype(dtype)
            )
            fn = make(kernel, dtype)
            float(jnp.sum(fn(x).astype(jnp.float32)))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(N_TIME):
                out = fn(x)
            # Materialise a scalar: block_until_ready can return before
            # remote execution finishes (CLAUDE.md).
            float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / N_TIME
            results[f"{name}_{dtype_name}"] = ops_per * elems / dt
    results["ratio_wmix"] = results["wmix_bf16"] / results["wmix_f32"]
    results["ratio_fma"] = results["fma_bf16"] / results["fma_f32"]
    results["ok"] = True


def main() -> int:
    # MAIN-THREAD device ops, deliberately: a process whose only jax use
    # happened on a daemon worker thread dies with SIGABRT at interpreter
    # teardown and poisons the tunnel for the NEXT client (measured
    # 2026-08-19, scripts/probe_tpu.py docstring).  Wedge-bounding is the
    # caller's job (measure_all.sh wraps every leg in `timeout`); gate
    # with scripts/probe_tpu.py first if the tunnel state is unknown.
    results: dict = {"ok": False}
    try:
        _measure(results)
    except Exception as e:  # noqa: BLE001 - recorded in the artifact
        results["error"] = repr(e)
    print(json.dumps(results))
    return 0 if results.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
