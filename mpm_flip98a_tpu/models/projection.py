"""Incompressible pressure projection (EXTENSION beyond the reference).

The reference integrates a weakly-compressible EOS (stiff Tait/linear
pressure, cpp_validation/mls-mpm88-explained.cpp:56-59) — acoustic waves
limit dt and volume drifts O(1e-3) over long runs.  This module adds the
classic alternative for the same free-surface use case: a Chorin-style
nodal projection (Zhu & Bridson 2005 FLIP) that makes the grid velocity
field discretely divergence-free each substep.

Discretization: a MAC-like forward/backward pair on the nodal grid.
The scaled pressure q (= dt/rho p) lives on nodes; its FORWARD
difference along each axis is an edge value, and the BACKWARD difference
of edge values is the nodal divergence — the composition is exactly the
compact 2d+1-point masked Laplacian the CG solves, so the correction
annihilates the discrete divergence on interior fluid nodes (no
collocated-central checkerboard null space; central/central pairing was
measured to leave the divergence UNreduced).

  edge mask  m_a[n]   : edge n -> n+e_a active unless either end is SOLID
  constraint nodes    : FLUID = grid mass > floor, strictly inside walls
  A q [n] = sum_a ( m_a[n]      (q[n] - q[n+e_a])
                  + m_a[n-e_a]  (q[n] - q[n-e_a]) )          (x 1/dx^2)
  b   [n] = sum_a ( v_a[n] - v_a[n-e_a] ) / dx               on FLUID
  v_a[n] -= FLUID[n] m_a[n] (q[n+e_a] - q[n]) / dx

Air neighbors carry Dirichlet q = 0 (free surface), solid neighbors drop
out of the stencil (Neumann).  Matrix-free CG inside jit
(`lax.while_loop`, iteration cap + relative-residual exit); neighbor
shifts are `jnp.roll` — wrapped values land on out-of-wall nodes whose
edge masks are zero, so wraparound never leaks.

Single-device general path only: CG's dot products are global
reductions, so the slab-sharded paths reject the switch loudly rather
than silently solving per-shard Poisson problems.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shift(a: jax.Array, axis: int, off: int) -> jax.Array:
    """Neighbor value a[idx + off] along axis (jnp.roll; wrapped entries
    are masked out by the caller's edge/fluid coefficients)."""
    return jnp.roll(a, -off, axis)


def divergence_b(v: jax.Array, dx: float) -> jax.Array:
    """Backward-difference nodal divergence of a (G..., d) velocity grid
    (the projection's own discrete divergence)."""
    d = v.shape[-1]
    acc = jnp.zeros(v.shape[:-1], v.dtype)
    for a in range(d):
        acc = acc + (v[..., a] - _shift(v[..., a], a, -1))
    return acc / dx


@functools.partial(jax.jit, static_argnames=("dx", "lo", "hi", "iters", "tol"))
def project(
    v: jax.Array,
    g_m: jax.Array,
    floor: float | jax.Array,
    *,
    dx: float,
    lo: int,
    hi: int,
    iters: int = 60,
    tol: float = 1e-4,
):
    """Make `v` (G..., d) discretely divergence-free on fluid nodes.

    Returns (v_projected, q, residual_ratio): q is the scaled pressure
    (p = q rho / dt) for diagnostics, residual_ratio = |r|/|b| at exit.
    `lo`/`hi` are the wall node thresholds (PAD, G-1-PAD): nodes at or
    beyond them along any axis are SOLID."""
    d = v.shape[-1]
    shape = v.shape[:-1]
    dt_ = v.dtype
    idx = [
        jnp.arange(shape[a]).reshape(
            tuple(-1 if i == a else 1 for i in range(d))
        )
        for a in range(d)
    ]
    solid = jnp.zeros(shape, bool)
    for a in range(d):
        solid = solid | (idx[a] <= lo) | (idx[a] >= hi)
    fluid = (g_m > floor) & ~solid
    fluid_f = fluid.astype(dt_)
    nonsolid = (~solid).astype(dt_)
    # Edge n -> n+e_a active unless either endpoint is solid.
    edge = [nonsolid * _shift(nonsolid, a, 1) for a in range(d)]

    def lap(q):
        acc = jnp.zeros(shape, dt_)
        for a in range(d):
            acc = acc + edge[a] * (q - _shift(q, a, 1))
            acc = acc + _shift(edge[a], a, -1) * (q - _shift(q, a, -1))
        return acc * fluid_f

    # RHS: dx^2-scaled compact equation.  The masked stencil `lap` is the
    # POSITIVE-definite -lap operator (diagonal +), so lap q = -dx^2 div v
    # gives div(v - grad q) = div v + lap(q)/dx^2 = 0 on interior fluid.
    b = -divergence_b(v, dx) * jnp.asarray(dx * dx, dt_) * fluid_f
    b2 = jnp.sum(b * b)

    def body(state):
        q, r, p, rs, it = state
        ap = lap(p)
        alpha = rs / jnp.maximum(jnp.sum(p * ap), jnp.finfo(dt_).tiny)
        q = q + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        p = r + (rs_new / jnp.maximum(rs, jnp.finfo(dt_).tiny)) * p
        return q, r, p, rs_new, it + 1

    def cond(state):
        _, _, _, rs, it = state
        return (it < iters) & (rs > tol * tol * b2)

    q0 = jnp.zeros(shape, dt_)
    q, r, _, rs, _ = jax.lax.while_loop(cond, body, (q0, b, b, b2, 0))
    # q is only meaningful on fluid nodes (Dirichlet 0 elsewhere).
    q = q * fluid_f

    # v_a[n] -= m_a[n] (q[n+e_a] - q[n]) / dx, applied on FLUID nodes only
    # (air-node velocities near the surface stay untouched zeros — they
    # carry no mass and correcting them would inject junk into knife-edge
    # G2P taps).
    s = jnp.asarray(1.0 / dx, dt_)
    parts = []
    for a in range(d):
        gq = edge[a] * (_shift(q, a, 1) - q) * s
        parts.append(v[..., a] - gq * fluid_f)
    v_out = jnp.stack(parts, axis=-1)
    resid = jnp.sqrt(rs / jnp.maximum(b2, jnp.finfo(dt_).tiny))
    return v_out, q, resid
