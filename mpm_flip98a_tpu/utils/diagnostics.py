"""Physics diagnostics: conservation checks and kernel-consistency summary.

The reference carries per-particle consistency fields (partitionofUnity,
consistency_dx/dy, fields.py:15-18) as runtime self-checks; this module
adds the global invariants (total mass / momentum, volume ratio bounds) as
cheap jitted reductions.  On sharded states the same functions run under
`shard_map` with `psum` — the only collective the diagnostics need
(SURVEY.md section 5)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.state import Particles


@jax.jit
def summarize(p: Particles) -> Dict[str, jax.Array]:
    """Global invariants of a particle state."""
    return {
        "total_mass": jnp.sum(p.mass),
        "momentum_x": jnp.sum(p.mass * p.v[:, 0]),
        "momentum_y": jnp.sum(p.mass * p.v[:, -1]),
        "kinetic_energy": 0.5 * jnp.sum(p.mass * jnp.sum(p.v**2, axis=-1)),
        "j_min": jnp.min(jnp.where(p.mass > 0, p.J, 1.0)),
        "j_max": jnp.max(jnp.where(p.mass > 0, p.J, 1.0)),
        "pou_err": jnp.max(jnp.where(p.mass > 0, jnp.abs(p.pou - 1.0), 0.0)),
        "consistency_err": jnp.max(
            jnp.where(p.mass[:, None] > 0, jnp.abs(p.consistency), 0.0)
        ),
    }


def check(p: Particles, mass0: float, rtol: float = 1e-9) -> Dict[str, float]:
    """Host-side assertion helper: returns the summary, raises on a mass
    budget violation (mass is exactly conserved by construction)."""
    s = {k: float(v) for k, v in summarize(p).items()}
    if abs(s["total_mass"] - mass0) > rtol * max(mass0, 1.0):
        raise AssertionError(
            f"mass not conserved: {s['total_mass']} != {mass0}"
        )
    return s
