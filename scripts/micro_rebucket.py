"""Micro-benchmark: where do rebucket's ~235 ms (1M slots) go, and does a
stacked single-scatter beat 20 per-field scatters?

rebucket (ops/binning.bucket_by_row) = 1 argsort + 1 cummax rank scan +
20 independent unique-index scatters of (S,) fields.  The measured XLA
scatter rate is ~1e8 updates/s; IF that rate is per-INDEX rather than
per-element, moving all 20 fields as one (S, 20) row-scatter pays the
index-processing cost once — a potential ~10x on the dominant stage.
All fields are 4-byte, so they stack losslessly as uint32 bit patterns
(lax.bitcast_convert_type; scatter copies bits, no arithmetic).

Legs (S = 1M and S = 54k ~ the end-to-end scale):
  argsort        the key sort alone
  rank           sort + cummax rank + slot map (everything but the moves)
  scat20         20 separate (S,) scatters (current production)
  scat_stack     ONE (S, 20) uint32 row scatter (+ stack/unstack cost)
  take_stack     gather variant of the same move (permutation inverse)
  rebucket_now   production fast2d.rebucket end-to-end
  rebucket_new   bucket_by_row with the stacked move (if wired)

Run on a live chip:
    PYTHONPATH=.:/root/.axon_site python scripts/micro_rebucket.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mpm_flip98a_tpu.config import MPMConfig  # noqa: E402
from mpm_flip98a_tpu.models import fast2d, scenes  # noqa: E402
from mpm_flip98a_tpu.ops import binning  # noqa: E402

NF = 20


def timed(f, *args, reps=3):
    def sync(out):
        # materialise one scalar from the first array leaf (pytree-safe)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    sync(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def legs(tag, s, num_rows, capacity):
    rng = np.random.default_rng(0)
    row = jnp.asarray(rng.integers(0, num_rows, s), jnp.int32)
    active = jnp.asarray(rng.random(s) < 0.9)
    fields = tuple(
        jnp.asarray(rng.random(s), jnp.float32) for _ in range(NF)
    )

    big = jnp.asarray(num_rows, jnp.int32)

    @jax.jit
    def leg_argsort(row, active):
        key = jnp.where(active, jnp.clip(row, 0, num_rows - 1), big)
        return jnp.argsort(key)

    @jax.jit
    def leg_rank(row, active):
        key = jnp.where(active, jnp.clip(row, 0, num_rows - 1), big)
        order = jnp.argsort(key)
        key_sorted = key[order]
        i = jnp.arange(s, dtype=jnp.int32)
        is_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
        )
        seg_start = jax.lax.cummax(jnp.where(is_start, i, 0))
        rank = i - seg_start
        ok = (key_sorted < big) & (rank < capacity)
        slot = jnp.where(ok, key_sorted * capacity + rank, s)
        return jnp.full((s,), s, jnp.int32).at[order].set(
            slot, unique_indices=True
        )

    slot_of_src = leg_rank(row, active)
    float(jnp.sum(slot_of_src))

    @jax.jit
    def leg_scat20(slot_of_src, *fs):
        def one(f):
            out = jnp.zeros((num_rows * capacity + 1,), f.dtype)
            out = out.at[slot_of_src].set(
                f, mode="drop", unique_indices=True
            )
            return out[:-1].reshape(num_rows, capacity)

        return tuple(one(f) for f in fs)

    @jax.jit
    def leg_scat_stack(slot_of_src, *fs):
        stk = jnp.stack(
            [jax.lax.bitcast_convert_type(f, jnp.uint32) for f in fs],
            axis=-1,
        )  # (S, NF)
        out = jnp.zeros((num_rows * capacity + 1, NF), jnp.uint32)
        out = out.at[slot_of_src].set(stk, mode="drop", unique_indices=True)
        out = out[:-1]
        return tuple(
            jax.lax.bitcast_convert_type(out[:, k], fs[k].dtype).reshape(
                num_rows, capacity
            )
            for k in range(NF)
        )

    @jax.jit
    def leg_take_stack(slot_of_src, *fs):
        # inverse permutation: src_of_slot, then one gather of (S, NF)
        src_of_slot = (
            jnp.full((num_rows * capacity + 1,), s, jnp.int32)
            .at[slot_of_src]
            .set(jnp.arange(s, dtype=jnp.int32), mode="drop",
                 unique_indices=True)
        )[:-1]
        stk = jnp.stack(
            [jax.lax.bitcast_convert_type(f, jnp.uint32) for f in fs],
            axis=-1,
        )
        stk = jnp.concatenate(
            [stk, jnp.zeros((1, NF), jnp.uint32)], axis=0
        )
        out = jnp.take(stk, jnp.minimum(src_of_slot, s), axis=0)
        return tuple(
            jax.lax.bitcast_convert_type(out[:, k], fs[k].dtype).reshape(
                num_rows, capacity
            )
            for k in range(NF)
        )

    print(f"[{tag}] argsort     {timed(leg_argsort, row, active):8.2f} ms",
          flush=True)
    print(f"[{tag}] rank+map    {timed(leg_rank, row, active):8.2f} ms",
          flush=True)
    print(f"[{tag}] scat20      "
          f"{timed(leg_scat20, slot_of_src, *fields):8.2f} ms", flush=True)
    print(f"[{tag}] scat_stack  "
          f"{timed(leg_scat_stack, slot_of_src, *fields):8.2f} ms",
          flush=True)
    print(f"[{tag}] take_stack  "
          f"{timed(leg_take_stack, slot_of_src, *fields):8.2f} ms",
          flush=True)

    # exactness: stacked move == per-field move
    a = jax.jit(leg_scat20)(slot_of_src, *fields)
    bq = jax.jit(leg_scat_stack)(slot_of_src, *fields)
    for x, y in zip(a, bq):
        assert np.array_equal(np.asarray(x), np.asarray(y)), "stack mismatch"
    print(f"[{tag}] stacked move bit-exact", flush=True)


def prod_rebucket(tag, p, scene):
    spec = fast2d.FastSpec.for_particles(scene.cfg, p, headroom=1.5)
    b = fast2d.from_particles(p, scene.cfg, spec)
    f = jax.jit(lambda st: fast2d.rebucket(st, scene.cfg, spec))
    print(f"[{tag}] rebucket_prod {timed(f, b):8.2f} ms "
          f"(S={spec.rows * spec.capacity})", flush=True)


def main():
    legs("1M", 1_000_000, 513, 2048)
    legs("54k", 53_760, 105, 512)
    p, scene = scenes.dam_break_2d(MPMConfig(), dtype=np.float32)
    prod_rebucket("dam2d-8.5k", p, scene)
    sys.path.insert(0, ".")
    from bench import build_workload  # the BASELINE 1M/513² workload

    p, scene = build_workload(small=False)
    prod_rebucket("bench-1M", p, scene)
    print("MICRO REBUCKET DONE", flush=True)


if __name__ == "__main__":
    main()
