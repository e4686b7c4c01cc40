"""Particle <-> grid transfer primitives (P2G scatter, G2P gather).

These are the reference's hot loops (cpp_validation/mls-mpm88-explained.cpp:
53-102 P2G, :133-179 G2P; SURVEY.md section 3.1), re-designed for XLA:

- All 3^dim stencil contributions are materialised along a static stencil
  axis and scattered/gathered in ONE XLA scatter-add / gather op.  No
  Python-level per-particle loops, no data-dependent shapes.
- The scatter path (`p2g_scatter`) is the always-correct baseline; the
  binned gather path and Pallas kernels (`ops/binning.py`,
  `ops/pallas/`) are drop-in faster equivalents validated against it.

Index convention: grid arrays have shape (G, ..., G, c); flat scatter uses
row-major ravel of the node index.  Out-of-range stencil nodes are clipped
and their contribution zeroed (cannot happen in-domain because the
reference pads the grid — 4 cells outside the physical domain,
config.py:39 — but clipping keeps the op total-function).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _flat_node_index(
    base: jax.Array, offsets: np.ndarray, grid_shape: Tuple[int, ...]
) -> Tuple[jax.Array, jax.Array]:
    """Flattened node indices for every (particle, stencil node) pair.

    base: (N, d) int32; offsets: (S, d) static.
    Returns (flat (N, S) int32, in_bounds (N, S) bool).
    """
    idx = base[:, None, :] + jnp.asarray(offsets)[None, :, :]  # (N, S, d)
    in_bounds = jnp.all(
        (idx >= 0) & (idx < jnp.asarray(grid_shape, jnp.int32)[None, None, :]), axis=-1
    )
    idx_clipped = jnp.clip(idx, 0, jnp.asarray(grid_shape, jnp.int32) - 1)
    strides = np.concatenate(
        [np.cumprod(np.asarray(grid_shape[1:], np.int64)[::-1])[::-1], [1]]
    ).astype(np.int32)
    flat = jnp.sum(idx_clipped * jnp.asarray(strides)[None, None, :], axis=-1)
    return flat, in_bounds


def p2g_scatter(
    values: jax.Array,
    base: jax.Array,
    offsets: np.ndarray,
    grid_shape: Tuple[int, ...],
) -> jax.Array:
    """Scatter-add per-(particle, stencil-node) values onto the grid.

    values: (N, S, c) — already weighted contributions for each stencil node
    base:   (N, d) int32 base node per particle
    Returns grid (G..., c).

    One `jnp.ndarray.at[].add` over the flattened grid — XLA lowers this to
    its native scatter-add; determinism on CPU makes the oracle comparison
    exact up to reassociation (SURVEY.md section 7, hard part b).
    """
    n, s, c = values.shape
    flat, in_bounds = _flat_node_index(base, offsets, grid_shape)
    values = jnp.where(in_bounds[..., None], values, 0)
    num_nodes = int(np.prod(grid_shape))
    out = jnp.zeros((num_nodes, c), values.dtype)
    out = out.at[flat.reshape(-1)].add(values.reshape(-1, c))
    return out.reshape(grid_shape + (c,))


def g2p_gather(
    grid: jax.Array,
    base: jax.Array,
    offsets: np.ndarray,
) -> jax.Array:
    """Gather grid values at every stencil node of every particle.

    grid: (G..., c); base: (N, d) int32.
    Returns (N, S, c).
    """
    grid_shape = grid.shape[:-1]
    c = grid.shape[-1]
    flat, in_bounds = _flat_node_index(base, offsets, grid_shape)
    flat_grid = grid.reshape(-1, c)
    vals = flat_grid[flat.reshape(-1)].reshape(flat.shape + (c,))
    return jnp.where(in_bounds[..., None], vals, 0)
