"""Row-bucketed particle layout for the Pallas transfer kernels.

XLA's scatter/gather on TPU processes ~1e8 updates/s — 20x short of the
1e9 transfer-ops/s target (measured, see bench history).  The TPU-native
answer is to restructure the transfer as dense MXU work: particles are
bucketed by their stencil base row (grid axis 0), one fixed-capacity bucket
of K slots per grid row, so the Pallas kernels (ops/pallas/) can process
"one grid row of particles" per program and turn the column scatter/gather
into one-hot matrix products.  (This is the TPU analogue of the reference's
cell-sorted GPU scatter strategy discussed in SURVEY.md section 7.)

The bucketed layout is the persistent state of the fast path.  Because a
substep moves particles by << 1 cell (CFL), and the kernels tolerate a
+-1-row drift margin, `bucket_by_row` only needs to run when some particle
approaches the margin — the fast path triggers it adaptively (hundreds of
substeps apart), so its cost amortises to noise.

Implementation notes, all performance-measured on v5e:
- ranks within a row come from one `cummax` scan over the sorted keys
  (`searchsorted` lowers to a 300+ ms binary-search loop — never use it in
  a hot path);
- fields move as ONE stacked (S, n_fields) uint32 GATHER through the
  inverse permutation, not per-field scatters: the ~1e8/s TPU
  scatter/gather rate is per-INDEX, so 20 per-field moves pay the index
  processing 20x.  Measured at 1M slots on v5e-1 (2026-08-19,
  docs/measurements/r5_micro_rebucket.log): 20 scatters 142.7 ms, one
  stacked (S, 20) scatter 122.5 ms, one stacked gather **41.5 ms**
  (all incl. ~24 ms sync floor; bit-exact vs per-field).  The earlier
  "take costs ~2x a unique scatter" lore holds per-FIELD — stacking
  inverts it.  All bucket fields are 4-byte, so they stack losslessly
  as uint32 bit patterns (bitcast_convert_type; moves copy bits, no
  arithmetic).

All shapes static: (R, K) slot arrays + validity mask; bucket overflow is
counted, never silently dropped.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bucket_by_row(
    row: jax.Array,      # (S,) int32 target row per slot (garbage where inactive)
    active: jax.Array,   # (S,) bool
    fields: Tuple[jax.Array, ...],  # each (S,) — slot-major flat views
    num_rows: int,
    capacity: int,
) -> Tuple[Tuple[jax.Array, ...], jax.Array, jax.Array]:
    """Sort slots into (num_rows, capacity) buckets.

    Returns (bucketed fields each (R, K), mask (R, K) bool, overflow count).
    Stable within a row (sort is stable on the flat slot order).  Slots
    beyond a row's capacity are dropped and counted in `overflow` — the
    caller sizes K so this never happens and asserts on the counter.
    """
    s = row.shape[0]
    big = jnp.asarray(num_rows, jnp.int32)
    key = jnp.where(active, jnp.clip(row, 0, num_rows - 1), big)
    order = jnp.argsort(key)  # stable
    key_sorted = key[order]

    # Rank within equal-key runs via one cumulative-max scan.
    i = jnp.arange(s, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), key_sorted[1:] != key_sorted[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(is_start, i, 0))
    rank = i - seg_start

    ok = (key_sorted < big) & (rank < capacity)
    overflow = jnp.sum((key_sorted < big) & (rank >= capacity)).astype(jnp.int32)
    nslots = num_rows * capacity
    # Dropped/inactive positions get UNIQUE out-of-bounds indices
    # (nslots + 1 + position): mode="drop" discards them and the
    # unique_indices contract stays honest (a shared sentinel index
    # would be a duplicate-write — UB under unique_indices=True).
    slot = jnp.where(ok, key_sorted * capacity + rank, nslots + 1 + i)

    # Invert the (sorted position -> slot) assignment into slot -> source:
    # one int32 scatter builds the map, then ALL fields + mask move in a
    # single stacked (S, n_fields + 1) uint32 gather (see module notes —
    # 20 per-field scatters cost ~3.4x this at 1M slots).  Unfilled slots
    # keep index s, gathering the zero sentinel row: identical zero-fill
    # (and mask=False) to the old per-field scatter.
    src_of_slot = (
        jnp.full((nslots,), s, jnp.int32)
        .at[slot]
        .set(order, mode="drop", unique_indices=True)
    )

    stk = jnp.stack(
        [jax.lax.bitcast_convert_type(f, jnp.uint32) for f in fields]
        + [active.astype(jnp.uint32)],
        axis=-1,
    )
    stk = jnp.concatenate([stk, jnp.zeros((1, stk.shape[1]), jnp.uint32)])
    moved = jnp.take(stk, src_of_slot, axis=0)  # (nslots, n_fields + 1)

    bucketed = tuple(
        jax.lax.bitcast_convert_type(moved[:, k], f.dtype).reshape(
            num_rows, capacity
        )
        for k, f in enumerate(fields)
    )
    mask = (moved[:, -1] > 0).reshape(num_rows, capacity)
    return bucketed, mask, overflow
