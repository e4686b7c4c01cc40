"""Fast 3D fluid solver: pencil-bucketed Pallas path.

3D counterpart of models/fast2d.py for the BASELINE.json configs[3]
workload (3D free-surface flow, 8M particles, 256^3 grid, quadratic
B-spline transfers): weakly-compressible FLIP98A fluid, APIC/PIC transfer,
slip/sticky box.  Particles live in (R0 x R1, K) pencil buckets — one
bucket per (x, y) grid line — processed by the 3D Pallas kernels
(ops/pallas/transfer3d.py); rebucketing is adaptive on the two bucketed
axes exactly like the 2D path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import EOSKind, KernelKind, MPMConfig, TransferKind
from mpm_flip98a_tpu.models.stabilized import PAD, Scene, _apply_wall_bc
from mpm_flip98a_tpu.ops import binning
from mpm_flip98a_tpu.ops.pallas import transfer3d as tk3
from mpm_flip98a_tpu.state import Particles


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


_C_NAMES = tuple(f"C{a}{b}" for a in range(3) for b in range(3))


@_pytree_dataclass
class FluidBuckets3D:
    """Pencil-bucketed 3D fluid state; every field (R0 * R1, K) f32."""

    x0: jax.Array
    x1: jax.Array
    x2: jax.Array
    v0: jax.Array
    v1: jax.Array
    v2: jax.Array
    C00: jax.Array
    C01: jax.Array
    C02: jax.Array
    C10: jax.Array
    C11: jax.Array
    C12: jax.Array
    C20: jax.Array
    C21: jax.Array
    C22: jax.Array
    J: jax.Array
    mass: jax.Array
    vol0: jax.Array
    mask: jax.Array
    overflow: jax.Array

    @property
    def shape(self) -> Tuple[int, int]:
        return self.x0.shape


@dataclasses.dataclass(frozen=True)
class FastSpec3D:
    rows0: int
    rows1: int
    capacity: int

    @staticmethod
    def for_particles(cfg: MPMConfig, p: Particles, headroom: float = 1.5) -> "FastSpec3D":
        g = cfg.num_grids
        x = np.asarray(p.x)
        r0 = np.floor(x[:, 0] * cfg.inv_dx + PAD - 0.5).astype(np.int64)
        r1 = np.floor(x[:, 1] * cfg.inv_dx + PAD - 0.5).astype(np.int64)
        pair = np.clip(r0, 0, g - 1) * g + np.clip(r1, 0, g - 1)
        occ = int(np.bincount(pair, minlength=g * g).max())
        # Kernels chunk the slot axis at 128 — a 128-multiple always
        # divides into equal 128-slot chunks.
        cap = max(128, -(-int(headroom * occ) // 128) * 128)
        return FastSpec3D(rows0=g, rows1=g, capacity=cap)


def _field_list(b: FluidBuckets3D):
    return (
        b.x0, b.x1, b.x2, b.v0, b.v1, b.v2,
        b.C00, b.C01, b.C02, b.C10, b.C11, b.C12, b.C20, b.C21, b.C22,
        b.J, b.mass, b.vol0,
    )


def _pair_row(x0, x1, cfg: MPMConfig, spec: FastSpec3D):
    gx0 = x0 * cfg.inv_dx + PAD
    gx1 = x1 * cfg.inv_dx + PAD
    r0 = jnp.floor(gx0 - 0.5).astype(jnp.int32)
    r1 = jnp.floor(gx1 - 0.5).astype(jnp.int32)
    return jnp.clip(r0, 0, spec.rows0 - 1) * spec.rows1 + jnp.clip(
        r1, 0, spec.rows1 - 1
    )


def _safe_dead_slots(b: FluidBuckets3D) -> FluidBuckets3D:
    """Neutral-fill inactive slots (J = 1): bucket_by_row zero-fills them,
    and J = 0 blows up the Tait EOS 1/J power into inf -> masked NaN."""
    on = b.mask > 0
    return dataclasses.replace(b, J=jnp.where(on, b.J, jnp.ones_like(b.J)))


def rebucket(b: FluidBuckets3D, cfg: MPMConfig, spec: FastSpec3D) -> FluidBuckets3D:
    flat = tuple(f.reshape(-1) for f in _field_list(b))
    mask = b.mask.reshape(-1) > 0
    row = _pair_row(flat[0], flat[1], cfg, spec)
    fields, new_mask, overflow = binning.bucket_by_row(
        row, mask, flat, spec.rows0 * spec.rows1, spec.capacity
    )
    return _safe_dead_slots(
        FluidBuckets3D(
            *fields, mask=new_mask.astype(jnp.float32), overflow=b.overflow + overflow
        )
    )


def from_particles(p: Particles, cfg: MPMConfig, spec: FastSpec3D) -> FluidBuckets3D:
    to32 = lambda a: jnp.asarray(a, jnp.float32)
    x = to32(p.x)
    v = to32(p.v)
    c = to32(p.C)
    flat = (
        x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1], v[:, 2],
        *(c[:, a, b2] for a in range(3) for b2 in range(3)),
        to32(p.J), to32(p.mass), to32(p.volume0),
    )
    row = _pair_row(flat[0], flat[1], cfg, spec)
    fields, mask, overflow = binning.bucket_by_row(
        row, jnp.ones((p.n,), jnp.bool_), flat, spec.rows0 * spec.rows1, spec.capacity
    )
    return _safe_dead_slots(
        FluidBuckets3D(*fields, mask=mask.astype(jnp.float32), overflow=overflow)
    )


def to_host(b: FluidBuckets3D) -> dict:
    mask = np.asarray(b.mask) > 0
    out = {}
    for name in ("x0", "x1", "x2", "v0", "v1", "v2", "J", "mass"):
        out[name] = np.asarray(getattr(b, name))[mask]
    return out


def substep(b: FluidBuckets3D, scene: Scene, spec: FastSpec3D) -> FluidBuckets3D:
    cfg = scene.cfg
    assert cfg.dim == 3
    if cfg.kernel != KernelKind.BSPLINE:
        raise NotImplementedError(
            "fast3d implements the quadratic B-spline only; use the general "
            "path (models/stabilized.py) for kernel=TENT in 3D"
        )
    g = cfg.num_grids
    r0, r1 = spec.rows0, spec.rows1
    dt = jnp.float32(cfg.dt)
    dx = float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    inv_dx = jnp.float32(cfg.inv_dx)

    gx = [b.x0 * inv_dx + PAD, b.x1 * inv_dx + PAD, b.x2 * inv_dx + PAD]

    # ---- fluid stress --------------------------------------------------
    kb = jnp.float32(scene.params.bulk_modulus)
    mu = jnp.float32(scene.params.dynamic_viscosity)
    if scene.params.eos == EOSKind.LINEAR:
        pressure = -kb * (b.J - 1.0)
    else:
        gamma = jnp.float32(scene.params.tait_gamma)
        # Guarded against degenerate J (see fast2d._safe_dead_slots).
        j_safe = jnp.maximum(b.J, jnp.float32(1e-3))
        pressure = (kb / gamma) * ((1.0 / j_safe) ** gamma - 1.0)
    cmat = [[getattr(b, f"C{a}{c}") for c in range(3)] for a in range(3)]
    div = cmat[0][0] + cmat[1][1] + cmat[2][2]
    vj = b.vol0 * b.J
    tau = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for c in range(3):
            e_ac = 0.5 * (cmat[a][c] + cmat[c][a])
            dev = e_ac - (div / 3.0 if a == c else 0.0)
            tau[a][c] = vj * ((-pressure if a == c else 0.0) + 2.0 * mu * dev)

    fa = -dt * jnp.float32(dinv)
    m = b.mass * b.mask
    if cfg.transfer == TransferKind.APIC:
        p_aff = [[b.mass * cmat[a][c] * b.mask for c in range(3)] for a in range(3)]
    else:
        z = jnp.zeros_like(b.J)
        p_aff = [[z] * 3 for _ in range(3)]
    q_aff = [
        [p_aff[a][c] + fa * tau[a][c] * b.mask for c in range(3)] for a in range(3)
    ]

    fields = (
        gx[0], gx[1], gx[2],
        m * b.v0, m * b.v1, m * b.v2,
        *(p_aff[a][c] for a in range(3) for c in range(3)),
        *(q_aff[a][c] for a in range(3) for c in range(3)),
        m, vj * b.mask,
    )
    pdata = jnp.stack(fields, axis=1).reshape(r0, r1, 26, spec.capacity)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)

    # ---- P2G + grid update ---------------------------------------------
    gs = tk3.fold_rows0(tk3.p2g3d(pdata, counts, g, g, dx))  # (8, G, G, G)
    g_m = gs[6]
    has = g_m > 0
    safe = jnp.where(has, g_m, 1.0)
    v0g = jnp.where(has, gs[0:3] / safe, 0.0)
    vng = jnp.where(has, gs[3:6] / safe, 0.0)
    grav = jnp.asarray(cfg.gravity_acceleration(scene.physics), jnp.float32)
    vng = vng + dt * grav[:, None, None, None] * has.astype(jnp.float32)
    v_new = _apply_wall_bc(jnp.moveaxis(vng, 0, -1), cfg, scene.wall)
    grid6 = jnp.concatenate([jnp.moveaxis(v_new, -1, 0), v0g], axis=0)  # (6,G,G,G)
    grid6 = jnp.moveaxis(grid6, 0, 2)  # (G0, G1, 6, G2)

    # ---- G2P ------------------------------------------------------------
    pdata2 = jnp.stack([gx[0], gx[1], gx[2], b.mask], axis=1).reshape(
        r0, r1, 4, spec.capacity
    )
    out = tk3.g2p3d(pdata2, counts, grid6, dx, dinv).reshape(
        r0 * r1, tk3.G2P_OUT, spec.capacity
    )
    vpic = [out[:, a] for a in range(3)]
    vold = [out[:, 3 + a] for a in range(3)]
    c_new = [out[:, 6 + i] for i in range(9)]

    alpha = jnp.float32(cfg.flip_blend)
    nv = [
        alpha * (vv + vp - vo) + (1 - alpha) * vp
        for vv, vp, vo in zip((b.v0, b.v1, b.v2), vpic, vold)
    ]
    div_new = c_new[0] + c_new[4] + c_new[8]
    return FluidBuckets3D(
        x0=b.x0 + dt * vpic[0] * b.mask,
        x1=b.x1 + dt * vpic[1] * b.mask,
        x2=b.x2 + dt * vpic[2] * b.mask,
        v0=nv[0] * b.mask,
        v1=nv[1] * b.mask,
        v2=nv[2] * b.mask,
        C00=c_new[0], C01=c_new[1], C02=c_new[2],
        C10=c_new[3], C11=c_new[4], C12=c_new[5],
        C20=c_new[6], C21=c_new[7], C22=c_new[8],
        J=jnp.where(b.mask > 0, b.J * (1.0 + dt * div_new), 1.0),
        mass=b.mass,
        vol0=b.vol0,
        mask=b.mask,
        overflow=b.overflow,
    )


def _needs_rebucket(b: FluidBuckets3D, cfg: MPMConfig, spec: FastSpec3D) -> jax.Array:
    s, k = b.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, k), 0)
    r0 = (rows // spec.rows1).astype(jnp.float32)
    r1 = (rows % spec.rows1).astype(jnp.float32)
    gx0 = b.x0 * jnp.float32(cfg.inv_dx) + jnp.float32(PAD)
    gx1 = b.x1 * jnp.float32(cfg.inv_dx) + jnp.float32(PAD)
    d0 = jnp.where(b.mask > 0, gx0 - 0.5 - r0, 0.5)
    d1 = jnp.where(b.mask > 0, gx1 - 0.5 - r1, 0.5)
    bad = (d0 <= -0.8) | (d0 >= 1.8) | (d1 <= -0.8) | (d1 >= 1.8)
    return jnp.any(bad)


@partial(jax.jit, static_argnames=("scene", "spec", "n_substeps"))
def run(
    b: FluidBuckets3D, scene: Scene, spec: FastSpec3D, n_substeps: int
) -> FluidBuckets3D:
    def body(_, st):
        st = jax.lax.cond(
            _needs_rebucket(st, scene.cfg, spec),
            lambda s: rebucket(s, scene.cfg, spec),
            lambda s: s,
            st,
        )
        return substep(st, scene, spec)

    return jax.lax.fori_loop(0, n_substeps, body, b)
