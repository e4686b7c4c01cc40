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
- fields are moved with ONE scatter each by composing the sort permutation
  into a source->slot map first (`take` (gather) costs ~2x a unique-index
  scatter on TPU).

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
    slot = jnp.where(ok, key_sorted * capacity + rank, s)  # s -> dropped bin

    # Compose permutation + destination into a source -> slot map so each
    # field moves with a single unique-index scatter (no gathers).
    slot_of_src = (
        jnp.full((s,), s, jnp.int32).at[order].set(slot, unique_indices=True)
    )

    def scatter_field(f):
        out = jnp.zeros((num_rows * capacity + 1,), f.dtype)
        out = out.at[slot_of_src].set(f, mode="drop", unique_indices=True)
        return out[:-1].reshape(num_rows, capacity)

    bucketed = tuple(scatter_field(f) for f in fields)
    mask = jnp.zeros((num_rows * capacity + 1,), jnp.bool_)
    mask = mask.at[slot_of_src].set(active, mode="drop", unique_indices=True)
    mask = mask[:-1].reshape(num_rows, capacity)
    return bucketed, mask, overflow
