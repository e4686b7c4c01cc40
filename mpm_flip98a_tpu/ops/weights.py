"""Interpolation kernels and stencil utilities for particle-grid transfer.

The reference uses a quadratic B-spline with support 1.5 dx
(reference: config.py:41-43; cpp_validation/mls-mpm88-explained.cpp:59-64)
and offers a "tent" (linear hat) alternative behind
``switch_kernelFunction`` (reference: config.py:21).  Both are evaluated
per-axis and combined by tensor product over a static 3^dim stencil —
everything statically shaped so XLA vectorises the whole stencil at once.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import KernelKind


def base_and_fx(x: jax.Array, inv_dx) -> Tuple[jax.Array, jax.Array]:
    """Base grid node and fractional offset of each particle.

    base = floor(x/dx - 0.5), fx = x/dx - base  (fx in [0.5, 1.5))
    (reference: mls-mpm88-explained.cpp:55-57.  The C++ casts to int, i.e.
    truncates; positions are strictly positive in-domain so floor == trunc.)

    x: (N, d) positions.  Returns (base (N, d) int32, fx (N, d)).
    """
    inv_dx = jnp.asarray(inv_dx, x.dtype)
    xs = x * inv_dx
    base = jnp.floor(xs - jnp.asarray(0.5, x.dtype)).astype(jnp.int32)
    fx = xs - base.astype(x.dtype)
    return base, fx


def quadratic_bspline(fx: jax.Array) -> jax.Array:
    """Quadratic B-spline weights at the 3 stencil nodes per axis.

    w = [0.5 (1.5 - fx)^2, 0.75 - (fx - 1)^2, 0.5 (fx - 0.5)^2]
    (reference: mls-mpm88-explained.cpp:60-64, mpm.graphics Eqn. 123).

    fx: (N, d) -> (N, 3, d).
    """
    half = jnp.asarray(0.5, fx.dtype)
    w0 = half * jnp.square(jnp.asarray(1.5, fx.dtype) - fx)
    w1 = jnp.asarray(0.75, fx.dtype) - jnp.square(fx - jnp.asarray(1.0, fx.dtype))
    w2 = half * jnp.square(fx - half)
    return jnp.stack([w0, w1, w2], axis=-2)


def tent(fx: jax.Array) -> jax.Array:
    """Linear hat weights on the same 3-node stencil.

    w_i = max(0, 1 - |fx - i|); exact partition of unity with 2 of the 3
    nodes active.  The reference exposes this as the non-B-spline branch of
    ``switch_kernelFunction`` (config.py:21); the withheld solver's kernel is
    not published, so the standard linear shape function is used.

    fx: (N, d) -> (N, 3, d).
    """
    one = jnp.asarray(1.0, fx.dtype)
    ws = [jnp.maximum(jnp.zeros_like(fx), one - jnp.abs(fx - i)) for i in (0.0, 1.0, 2.0)]
    return jnp.stack(ws, axis=-2)


def kernel_weights(fx: jax.Array, kind: KernelKind) -> jax.Array:
    if kind == KernelKind.BSPLINE:
        return quadratic_bspline(fx)
    return tent(fx)


def stencil_offsets(dim: int) -> np.ndarray:
    """Static (3^dim, dim) int array of stencil node offsets in {0, 1, 2}."""
    grids = np.meshgrid(*([np.arange(3)] * dim), indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1).astype(np.int32)


def stencil_weights(w_axes: jax.Array, offsets: np.ndarray) -> jax.Array:
    """Tensor-product stencil weights.

    w_axes: (N, 3, d) per-axis weights; offsets: (S, d) static.
    Returns (N, S) with S = 3^d, entry = prod_k w_axes[n, offsets[s, k], k]
    (reference: mls-mpm88-explained.cpp:98 ``w[i].x * w[j].y``).
    """
    dim = offsets.shape[1]
    prod = w_axes[:, offsets[:, 0], 0]
    for k in range(1, dim):
        prod = prod * w_axes[:, offsets[:, k], k]
    return prod


def stencil_dpos(fx: jax.Array, offsets: np.ndarray) -> jax.Array:
    """Node-minus-particle offsets in grid units.

    fx: (N, d), offsets: (S, d) -> (N, S, d): offsets - fx
    (reference: mls-mpm88-explained.cpp:94,149 — P2G multiplies by dx, G2P
    keeps grid units; callers scale as needed).
    """
    return offsets.astype(fx.dtype)[None, :, :] - fx[:, None, :]
