"""Material models: per-particle stress evaluation, batched and branch-free.

All materials return the V0-scaled Kirchhoff stress
    tau_hat = V0 * P(F) F^T = V0 * J * sigma_cauchy        (shape (N, d, d))
which is what the MLS-MPM force term consumes: the fused P2G affine
contribution is  -dt * Dinv * tau_hat  (reference:
cpp_validation/mls-mpm88-explained.cpp:79-89, where V0 = vol_p = 1).

Materials:
  WEAKLY_COMPRESSIBLE_FLUID — the free-surface flow model reconstructed
      from the reference's physical constants (config.py:4-12: K = 2e6 Pa,
      nu = 0.4999, mu_visc = 1e-3 Pa s) and particle fields (fields.py:19-21:
      pressure, divergenceofVelocity, particleDensity):
      sigma = -p I + 2 mu_visc dev(strain_rate), with p from an EOS on the
      (optionally F-bar-averaged) volume ratio J.
  FIXED_COROTATED — 2 mu (F - R) F^T + lambda (J - 1) J I
      (reference: mls-mpm88-explained.cpp:81), optional snow plasticity
      clamp applied at F-update time (:167-177).
  NEO_HOOKEAN — tau = mu (F F^T - I) + lambda log(J) I, the standard
      compressible neo-Hookean Kirchhoff stress (for the mixed
      elastic-in-fluid scenes, BASELINE.json configs[2]).

Mixed scenes dispatch on a per-particle ``material`` id
(reference: fields.py:12) with `jnp.where` selects — all materials are
evaluated vectorized and blended, which on TPU is far cheaper than
divergent control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import EOSKind
from mpm_flip98a_tpu.ops import mathx

# Material ids (per-particle, int32; reference: fields.py:12).
WEAKLY_COMPRESSIBLE_FLUID = 0
NEO_HOOKEAN = 1
FIXED_COROTATED = 2


@dataclasses.dataclass(frozen=True)
class MaterialParams:
    """Static per-simulation material constants (hashable, jit-static)."""

    # fluid
    bulk_modulus: float = 2e6          # K [Pa], config.py:8
    dynamic_viscosity: float = 1e-3    # mu [Pa s], config.py:6
    eos: EOSKind = EOSKind.LINEAR
    tait_gamma: float = 7.0
    # elastic solids (lame parameters)
    mu: float = 0.0
    lam: float = 0.0
    # snow plasticity clamp for FIXED_COROTATED (mls-mpm88-explained.cpp:169)
    plastic: bool = False
    sig_clamp_lo: float = 1.0 - 2.5e-2
    sig_clamp_hi: float = 1.0 + 7.5e-3


def fluid_pressure(params: MaterialParams, j_bar: jax.Array) -> jax.Array:
    """EOS pressure from the volume ratio.

    LINEAR: p = -K (J - 1)   (positive in compression)
    TAIT:   p = (K / gamma) ((1/J)^gamma - 1)
    """
    k = jnp.asarray(params.bulk_modulus, j_bar.dtype)
    if params.eos == EOSKind.LINEAR:
        return -k * (j_bar - 1.0)
    g = jnp.asarray(params.tait_gamma, j_bar.dtype)
    return (k / g) * (jnp.power(1.0 / j_bar, g) - 1.0)


def fluid_tau_hat(
    params: MaterialParams,
    volume0: jax.Array,
    j_bar: jax.Array,
    pressure: jax.Array,
    strain_rate: jax.Array,
) -> jax.Array:
    """Weakly-compressible viscous fluid: tau_hat = V0 J (-p I + 2 mu dev(eps_dot))."""
    d = strain_rate.shape[-1]
    dt = strain_rate.dtype
    mu = jnp.asarray(params.dynamic_viscosity, dt)
    dev = strain_rate - (mathx.trace(strain_rate) / d)[..., None, None] * jnp.eye(d, dtype=dt)
    sigma = (-pressure)[..., None, None] * jnp.eye(d, dtype=dt) + 2.0 * mu * dev
    return (volume0 * j_bar)[..., None, None] * sigma


def fixed_corotated_tau_hat(
    params: MaterialParams, volume0: jax.Array, f: jax.Array
) -> jax.Array:
    """tau_hat = V0 (2 mu (F - R) F^T + lambda (J - 1) J I)
    (reference: mls-mpm88-explained.cpp:81)."""
    d = f.shape[-1]
    dt = f.dtype
    j = mathx.det(f)
    r, _ = mathx.polar_decomp(f)
    mu = jnp.asarray(params.mu, dt)
    lam = jnp.asarray(params.lam, dt)
    pf = 2.0 * mu * mathx.mm(f - r, mathx.transpose(f)) + (
        (lam * (j - 1.0) * j)[..., None, None] * jnp.eye(d, dtype=dt)
    )
    return volume0[..., None, None] * pf


def neo_hookean_tau_hat(
    params: MaterialParams, volume0: jax.Array, f: jax.Array
) -> jax.Array:
    """tau_hat = V0 (mu (F F^T - I) + lambda log(J) I)."""
    d = f.shape[-1]
    dt = f.dtype
    j = jnp.maximum(mathx.det(f), jnp.asarray(1e-6, dt))
    mu = jnp.asarray(params.mu, dt)
    lam = jnp.asarray(params.lam, dt)
    b = mathx.mm(f, mathx.transpose(f))
    return volume0[..., None, None] * (
        mu * (b - jnp.eye(d, dtype=dt)) + (lam * jnp.log(j))[..., None, None] * jnp.eye(d, dtype=dt)
    )


def plastic_clamp(
    params: MaterialParams,
    material: jax.Array,
    f: jax.Array,
    materials_present: Tuple[int, ...] = (WEAKLY_COMPRESSIBLE_FLUID,),
) -> jax.Array:
    """Snow-plasticity singular-value clamp, applied at F-update time
    (reference: mls-mpm88-explained.cpp:164-170): F <- U clamp(Sigma) V^T
    for FIXED_COROTATED particles when ``params.plastic``.

    The reference's validation solver additionally tracks the plastic
    volume ratio Jp with hardening (:172-177); the production field set
    (fields.py) has no Jp, so hardening remains a validation-model-only
    feature (models/mls_mpm.py) and the production clamp is volume-only.
    Static no-op (returns ``f`` untouched) unless the scene declares a
    plastic fixed-corotated material.
    """
    if not params.plastic or FIXED_COROTATED not in materials_present:
        return f
    dt = f.dtype
    u, sig, v = mathx.svd(f)
    sig_c = jnp.clip(
        sig,
        jnp.asarray(params.sig_clamp_lo, dt),
        jnp.asarray(params.sig_clamp_hi, dt),
    )
    f_c = mathx.mm(u, sig_c[..., :, None] * mathx.transpose(v))
    if materials_present == (FIXED_COROTATED,):
        return f_c
    return jnp.where((material == FIXED_COROTATED)[..., None, None], f_c, f)


def tau_hat(
    params: MaterialParams,
    material: jax.Array,
    volume0: jax.Array,
    f: jax.Array,
    j_bar: jax.Array,
    pressure: jax.Array,
    strain_rate: jax.Array,
    materials_present: Tuple[int, ...] = (WEAKLY_COMPRESSIBLE_FLUID,),
) -> jax.Array:
    """Dispatch on per-particle material id.

    `materials_present` is static: only the stress branches that can occur
    in the scene are evaluated (single-material scenes compile to exactly
    one branch, no select).
    """
    if len(materials_present) == 1:
        mid = materials_present[0]
        if mid == WEAKLY_COMPRESSIBLE_FLUID:
            return fluid_tau_hat(params, volume0, j_bar, pressure, strain_rate)
        if mid == NEO_HOOKEAN:
            return neo_hookean_tau_hat(params, volume0, f)
        return fixed_corotated_tau_hat(params, volume0, f)

    out = jnp.zeros_like(f)
    for mid in materials_present:
        if mid == WEAKLY_COMPRESSIBLE_FLUID:
            t = fluid_tau_hat(params, volume0, j_bar, pressure, strain_rate)
        elif mid == NEO_HOOKEAN:
            t = neo_hookean_tau_hat(params, volume0, f)
        else:
            t = fixed_corotated_tau_hat(params, volume0, f)
        out = jnp.where((material == mid)[..., None, None], t, out)
    return out
