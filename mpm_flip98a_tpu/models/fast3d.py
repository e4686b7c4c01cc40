"""Fast 3D solver: pencil-bucketed Pallas path.

3D counterpart of models/fast2d.py for the BASELINE.json configs[3]
workload (3D free-surface flow, 8M particles, 256^3 grid, quadratic
B-spline transfers).  Particles live in (R0 x R1, K) pencil buckets — one
bucket per (x, y) grid line — processed by the 3D Pallas kernels
(ops/pallas/transfer3d.py); rebucketing is adaptive on the two bucketed
axes exactly like the 2D path.

Feature switches covered (round 2, mirroring fast2d.py): APIC/PIC
transfer, FLIP blend, linear/Tait EOS, slip/sticky walls, penalty EBC,
fused F-bar / pressure-mixing stabilization with the semi-implicit lag
correction, and multi-material dispatch (weakly-compressible fluid,
neo-Hookean, fixed corotated with a component-form scaled-Newton polar
matching ops/mathx.polar_decomp_3d).  kernel=TENT stays general-path-only
in 3D.
"""

from __future__ import annotations

import dataclasses
import os as _os
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mpm_flip98a_tpu.config import EOSKind, KernelKind, MPMConfig, TransferKind
from mpm_flip98a_tpu.models import materials as mat
from mpm_flip98a_tpu.models.stabilized import PAD, Scene
from mpm_flip98a_tpu.ops import binning
from mpm_flip98a_tpu.ops.pallas import transfer3d as tk3
from mpm_flip98a_tpu.state import Particles


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
class FluidBuckets3D:
    """Pencil-bucketed 3D state; every field (R0 * R1, K) f32 (mat int32)."""

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
    F00: jax.Array
    F01: jax.Array
    F02: jax.Array
    F10: jax.Array
    F11: jax.Array
    F12: jax.Array
    F20: jax.Array
    F21: jax.Array
    F22: jax.Array
    J: jax.Array
    mass: jax.Array
    vol0: jax.Array
    mat: jax.Array       # int32 material id (models/materials.py)
    Jp: jax.Array        # plastic volume ratio (SNOW hardening state)
    # Fused-stabilization state (lag-corrected nodal averages; only
    # meaningful when use_fbar / pressure mixing is on):
    jbar_s: jax.Array
    p_s: jax.Array
    div_s: jax.Array
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
    def for_particles(cfg: MPMConfig, p: Particles, headroom: float = None) -> "FastSpec3D":
        g = cfg.num_grids
        x = np.asarray(p.x)
        r0 = np.floor(x[:, 0] * cfg.inv_dx + PAD - 0.5).astype(np.int64)
        r1 = np.floor(x[:, 1] * cfg.inv_dx + PAD - 0.5).astype(np.int64)
        pair = np.clip(r0, 0, g - 1) * g + np.clip(r1, 0, g - 1)
        occ = int(np.bincount(pair, minlength=g * g).max())
        return FastSpec3D(rows0=g, rows1=g, capacity=capacity_for(occ, headroom))


def capacity_for(occ: int, headroom: float = None) -> int:
    """Pencil-bucket capacity for a peak occupancy: headroom-padded,
    128-multiple — the 3D kernels chunk the slot axis at 128, which a
    128-multiple always divides evenly.  MPM_HEADROOM overrides for
    on-chip A/B (see fast2d.capacity_for: headroom slots above the
    last active chunk boundary are dead in-kernel work)."""
    if headroom is None:
        headroom = float(_os.environ.get("MPM_HEADROOM", "1.5"))
    return max(128, -(-int(headroom * occ) // 128) * 128)


def _field_list(b: FluidBuckets3D):
    return (
        b.x0, b.x1, b.x2, b.v0, b.v1, b.v2,
        b.C00, b.C01, b.C02, b.C10, b.C11, b.C12, b.C20, b.C21, b.C22,
        b.F00, b.F01, b.F02, b.F10, b.F11, b.F12, b.F20, b.F21, b.F22,
        b.J, b.mass, b.vol0, b.mat, b.Jp,
        b.jbar_s, b.p_s, b.div_s,
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
    """Neutral-fill inactive slots (J = 1, F = I): bucket_by_row zero-fills
    them, and zeros blow up the Tait 1/J power and the corotated polar into
    inf -> masked NaN (0 * inf)."""
    on = b.mask > 0
    one = lambda a: jnp.where(on, a, jnp.ones_like(a))
    return dataclasses.replace(
        b, J=one(b.J), F00=one(b.F00), F11=one(b.F11), F22=one(b.F22),
        Jp=one(b.Jp), jbar_s=one(b.jbar_s),
    )


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
    f = to32(p.F)
    n = p.n
    flat = (
        x[:, 0], x[:, 1], x[:, 2], v[:, 0], v[:, 1], v[:, 2],
        *(c[:, a, b2] for a in range(3) for b2 in range(3)),
        *(f[:, a, b2] for a in range(3) for b2 in range(3)),
        to32(p.J), to32(p.mass), to32(p.volume0),
        p.material.astype(jnp.int32),
        to32(p.Jp),
        to32(p.J),                      # jbar_s init = J
        jnp.zeros((n,), jnp.float32),   # p_s
        jnp.zeros((n,), jnp.float32),   # div_s
    )
    row = _pair_row(flat[0], flat[1], cfg, spec)
    fields, mask, overflow = binning.bucket_by_row(
        row, jnp.ones((n,), jnp.bool_), flat, spec.rows0 * spec.rows1, spec.capacity
    )
    return _safe_dead_slots(
        FluidBuckets3D(*fields, mask=mask.astype(jnp.float32), overflow=overflow)
    )


def to_host(b: FluidBuckets3D) -> dict:
    """One gathered device_get — see fast2d.to_host: sequential fetches
    pay ~30 ms tunnel latency EACH on the remote backend."""
    names = ("x0", "x1", "x2", "v0", "v1", "v2", "J", "mass", "mat", "Jp")
    arrs = jax.device_get([b.mask] + [getattr(b, n) for n in names])
    mask = arrs[0] > 0
    return {n: a[mask] for n, a in zip(names, arrs[1:])}


def _axis_bands(cfg: MPMConfig, row_index0=None, row_index1=None):
    """(low, high) wall-band masks per axis, broadcastable against the
    channel-layout grid (G0, G1, ch, G2) — same node sets as
    models/stabilized._apply_wall_bc (box faces at PAD / G-1-PAD).
    `row_index0` / `row_index1` carry GLOBAL axis-0/1 node indices for a
    slab-local buffer (parallel/fast_domain3d.py)."""
    g = cfg.num_grids
    lo, hi = int(PAD), g - 1 - int(PAD)
    idx = jnp.arange(g)
    idx0 = idx if row_index0 is None else row_index0
    idx1 = idx if row_index1 is None else row_index1
    n0 = idx0.shape[0]
    n1 = idx1.shape[0]
    return [
        ((idx0 <= lo).reshape(n0, 1, 1, 1), (idx0 >= hi).reshape(n0, 1, 1, 1)),
        ((idx1 <= lo).reshape(1, n1, 1, 1), (idx1 >= hi).reshape(1, n1, 1, 1)),
        ((idx <= lo).reshape(1, 1, 1, g), (idx >= hi).reshape(1, 1, 1, g)),
    ]


def _wall_bc_ch(
    v: jax.Array, cfg: MPMConfig, wall, row_index0=None, row_index1=None
) -> jax.Array:
    """Slip/sticky walls on a channel-layout velocity grid (G0, G1, 3, G2);
    semantics identical to models/stabilized._apply_wall_bc."""
    bands = _axis_bands(cfg, row_index0, row_index1)
    if wall.kind == "sticky":
        anyband = jnp.zeros((), jnp.bool_)
        for low, high in bands:
            anyband = anyband | low | high
        return jnp.where(anyband, 0.0, v)
    parts = []
    for a, (low, high) in enumerate(bands):
        va = v[:, :, a : a + 1]
        va = jnp.where(low, jnp.maximum(va, 0.0), va)
        va = jnp.where(high, jnp.minimum(va, 0.0), va)
        parts.append(va)
    return jnp.concatenate(parts, axis=2)


def _wall_normal_diag_ch(
    cfg: MPMConfig, row_index0=None, row_index1=None
) -> jax.Array:
    """sum_walls n (x) n diagonal in channel layout (G0, G1, 3, G2);
    semantics identical to models/stabilized._wall_normal_diag."""
    g = cfg.num_grids
    bands = _axis_bands(cfg, row_index0, row_index1)
    n0 = bands[0][0].shape[0]
    n1 = bands[1][0].shape[1]
    diag = [
        jnp.broadcast_to((low | high), (n0, n1, 1, g)).astype(jnp.float32)
        for low, high in bands
    ]
    return jnp.concatenate(diag, axis=2)


def _polar3d_rows(F, iters: int = 12):
    """Component-form 3D polar rotation factor (same scaled Newton
    iteration as ops/mathx.polar_decomp_3d, on (S, K) component arrays —
    stacking (S, K, 3, 3) temporaries would pad the 3x3 trailing dims to
    full TPU tiles).  F is a 9-list [F00..F22]; returns the 9-list R."""
    r = list(F)

    def cof(m):
        # Cofactor matrix (row-major 9-list): cof[3a+c] = d inv-transpose.
        c = [None] * 9
        c[0] = m[4] * m[8] - m[5] * m[7]
        c[1] = m[5] * m[6] - m[3] * m[8]
        c[2] = m[3] * m[7] - m[4] * m[6]
        c[3] = m[2] * m[7] - m[1] * m[8]
        c[4] = m[0] * m[8] - m[2] * m[6]
        c[5] = m[1] * m[6] - m[0] * m[7]
        c[6] = m[1] * m[5] - m[2] * m[4]
        c[7] = m[2] * m[3] - m[0] * m[5]
        c[8] = m[0] * m[4] - m[1] * m[3]
        return c

    tiny = jnp.float32(np.finfo(np.float32).tiny)
    for _ in range(iters):
        c = cof(r)
        det = r[0] * c[0] + r[1] * c[1] + r[2] * c[2]
        inv_det = 1.0 / jnp.where(jnp.abs(det) > tiny, det, 1.0)
        rit = [ci * inv_det for ci in c]  # R^{-T} = cof(R) / det
        a = sum(x * x for x in rit)
        bb = sum(x * x for x in r)
        gamma = jnp.sqrt(jnp.sqrt(a / jnp.maximum(bb, tiny)))
        inv_g = 1.0 / gamma
        r = [0.5 * (gamma * r[i] + inv_g * rit[i]) for i in range(9)]
    return r


def _grid_update(
    gs: jax.Array, scene: Scene, ext: bool, row_index0=None, row_index1=None,
    domain=None, t=None,
) -> jax.Array:
    """Grid momentum update on the fold's (G0, G1, nch, G2) layout —
    transpose-free (fold_rows0 already emits the G2P grid layout; the
    moveaxis-based version cost ~30 ms/substep at 256^3)."""
    cfg = scene.cfg
    dt = jnp.float32(cfg.dt)
    g_m = gs[:, :, 6]                              # (G0, G1, G2)
    # Relative mass floor: knife-edge stencil taps (fx within 1 ulp of a
    # tap boundary) deposit ~1e-15 x a particle mass on isolated nodes;
    # momentum/mass there is pure fp noise that the velocity update turns
    # into O(1) junk kicks (measured: exponential blowup of an
    # under-resolved 64^3 scene on TPU, where FMA tap rounding differs
    # from the CPU build).  A node carrying < 1e-8 of the heaviest node
    # is dynamically meaningless — treat it as empty.  Absolute floor
    # (scene.mass_floor) when available: shard-invariant under shard_map
    # (the relative fallback uses the shard-LOCAL max, so neighboring
    # shards could disagree on `has` for shared halo rows).
    from mpm_flip98a_tpu.models.stabilized import _mass_floor

    has = g_m > _mass_floor(scene, g_m)
    safe = jnp.where(has, g_m, 1.0)
    hc = has[:, :, None]
    v0g = jnp.where(hc, gs[:, :, 0:3] / safe[:, :, None], 0.0)
    grav = jnp.asarray(cfg.gravity_acceleration(scene.physics), jnp.float32)
    gravc = grav[None, None, :, None]
    # Sharded grid-side extension hooks (CSF / projection): gather-only
    # halo refresh + psum axes + owned-row masks.  Mirrors fast2d.
    ext_axis = ext_halo = ext_own = None
    if domain is not None and (cfg.surface_tension > 0.0 or cfg.incompressible):
        rr0 = gs.shape[0]
        own0 = (jnp.arange(rr0) >= 1) & (jnp.arange(rr0) < rr0 - 3)
        if getattr(domain, "axis1", None) is not None:
            rr1 = gs.shape[1]
            own1 = (jnp.arange(rr1) >= 1) & (jnp.arange(rr1) < rr1 - 3)
            ext_own = own0[:, None, None] & own1[None, :, None]
            ext_axis = (domain.axis0, domain.axis1)
        else:
            ext_own = own0
            ext_axis = (domain.axis0,)
        ext_halo = domain.halo_gather_only
    if cfg.surface_tension > 0.0:
        # CSF surface tension on the (G0, G1, G2) nodal mass field — the
        # same grid-side force as the general path (stabilized._csf_force
        # is dim-agnostic); channel layout via a moveaxis on the force
        # (extension feature: correctness over layout).  VERDICT r3 item 5.
        from mpm_flip98a_tpu.models.stabilized import GridContext, _csf_force

        csf_ctx = None
        if domain is not None:
            csf_ctx = GridContext(
                node_shape=None, cell_shape=None,
                axis=ext_axis, halo_exchange=ext_halo,
            )
        f_st = _csf_force(g_m, cfg, scene.physics, jnp.float32, csf_ctx)
        st_scale = dt * g_m / jnp.float32(scene.physics.particle_density)
        st = jnp.moveaxis(f_st, -1, 2) * st_scale[:, :, None]  # (G0,G1,3,G2)
    else:
        st = None
    if cfg.use_penalty_ebc:
        # Implicit normal-velocity penalty, diagonal for the axis-aligned
        # box (same formulation as models/stabilized.py / fast2d.py).
        beta = jnp.float32(cfg.penalty_parameter(scene.physics))
        pen = _wall_normal_diag_ch(cfg, row_index0, row_index1)  # (G0, G1, 3, G2)
        rhs = gs[:, :, 3:6] + dt * g_m[:, :, None] * gravc
        if st is not None:
            rhs = rhs + st
        v_new = jnp.where(
            hc, rhs / (g_m[:, :, None] + dt * beta * pen), 0.0
        )
    else:
        vng = jnp.where(hc, gs[:, :, 3:6] / safe[:, :, None], 0.0)
        vng = vng + dt * gravc * hc.astype(jnp.float32)
        if st is not None:
            # (mv + dt F m/rho)/m == mv/m + st/m: the general path's rhs
            # form, bitwise a no-op when surface tension is off.
            vng = vng + jnp.where(hc, st / safe[:, :, None], 0.0)
        v_new = _wall_bc_ch(vng, cfg, scene.wall, row_index0, row_index1)
    col_solid = None
    if scene.colliders:
        # EXTENSION: rigid SDF colliders (models/colliders.py) on the
        # (G0, G1, G2) component planes — pointwise; sharded windows pass
        # global row indices.  After the wall/penalty BC.
        from mpm_flip98a_tpu.models import colliders as _col

        g0, g1 = gs.shape[0], gs.shape[1]
        idx0 = (jnp.arange(g0) if row_index0 is None else row_index0)
        idx1 = (jnp.arange(g1) if row_index1 is None else row_index1)
        coords = _col.node_coords(
            cfg,
            [
                idx0[:, None, None],
                idx1[None, :, None],
                jnp.arange(gs.shape[-1])[None, None, :],
            ],
        )
        comps = _col.project(
            [v_new[:, :, a] for a in range(3)], coords, scene.colliders, t
        )
        v_new = jnp.stack(comps, axis=2)
        col_solid = _col.inside_any(coords, scene.colliders, t)
    if cfg.incompressible:
        # Chorin projection on the (G0, G1, G2) velocity planes between
        # grid update and G2P (VERDICT r3 item 4); sharded slabs/pencils
        # run psum dots + gather-only halo refresh per CG iteration.
        from mpm_flip98a_tpu.models import projection as _proj

        floor = _mass_floor(scene, g_m)
        if ext_axis is not None and scene.mass_floor <= 0.0:
            # Shard-invariant relative floor (pmax over the mesh axes) so
            # halo planes classify fluid/air identically on both owners.
            floor = jax.lax.pmax(floor, ext_axis)
        vs, _, _ = _proj.project_planes(
            tuple(v_new[:, :, a] for a in range(3)),
            g_m, floor,
            dx=float(cfg.dx), lo=int(PAD), hi=cfg.num_grids - 1 - int(PAD),
            iters=int(cfg.pressure_iters), tol=float(cfg.pressure_tol),
            row_index0=row_index0, row_index1=row_index1,
            axis=ext_axis, halo=ext_halo, own=ext_own,
            solid_extra=col_solid,
        )
        v_new = jnp.stack(vs, axis=2)
    gparts = [v_new, v0g]
    if ext:
        v0sum = gs[:, :, 8]
        has_v = (v0sum > 0)[:, :, None]
        safe_v = jnp.where(has_v, gs[:, :, 8:9], 1.0)
        gparts.append(
            jnp.concatenate(
                [
                    jnp.where(has_v, gs[:, :, 7:8] / safe_v, 1.0),    # Jbar
                    jnp.where(has_v, gs[:, :, 9:10] / safe_v, 0.0),   # p
                    jnp.where(has_v, gs[:, :, 10:11] / safe_v, 0.0),  # div
                ],
                axis=2,
            )
        )
    return jnp.concatenate(gparts, axis=2)


def _finish_substep(
    b: FluidBuckets3D, scene: Scene, spec: FastSpec3D, expanded, counts,
    gxs, domain=None, x0k=None, x0_shift=None, row_index0=None,
    x1k=None, x1_shift=None, row_index1=None, grid_pad=None, raw_halo=None,
    t=None,
) -> FluidBuckets3D:
    """Fused tail of the single-fluid substep: grid update + the
    update-mode G2P (FLIP blend / advect / J update in-kernel).

    `grid_pad` (single-chip, from tk3.p2g3d_grid): the grid update and
    fold already ran in-kernel and the buffer is G2P-ready padded on both
    axes — skip straight to G2P.  `raw_halo` (sharded, from p2g3d_grid
    raw mode): the fold already ran in-kernel into the UNcropped halo
    layout (L0+4, L1+4, nch, G2) — exchange, then update."""
    cfg = scene.cfg
    r0, r1, k = spec.rows0, spec.rows1, spec.capacity
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    if x0k is None:
        x0k = b.x0
    if x1k is None:
        x1k = b.x1
    if grid_pad is not None:
        grid_ch = grid_pad
        pre0 = pre1 = True
    elif raw_halo is not None:
        gs = domain.halo_sync(raw_halo)
        if row_index1 is None:
            # 1-axis slab: axis 1 is global but the raw buffer carries
            # the axis-1 halo rows (plane row j = target j - 1, zeros —
            # no particles within 2 cells of the y walls).
            row_index1 = jnp.arange(r1 + 4) - 1
        grid_ch = _grid_update(
            gs, scene, ext=False, row_index0=row_index0,
            row_index1=row_index1, domain=domain, t=t,
        )
        pre0 = pre1 = True
    else:
        if domain is not None:
            gs = domain.halo_sync(tk3.fold_rows0_halo(expanded))
        else:
            gs = tk3.fold_rows0(expanded)
        grid_ch = _grid_update(
            gs, scene, ext=False, row_index0=row_index0,
            row_index1=row_index1, domain=domain, t=t,
        )
        pre0 = domain is not None
        pre1 = x1_shift is not None
    shaped = lambda a: a.reshape(r0, r1, k)
    out = tk3.g2p3d(
        *gxs, shaped(b.mask),
        counts, grid_ch, float(cfg.dx), dinv,
        state=(
            shaped(b.v0), shaped(b.v1), shaped(b.v2), shaped(b.J),
            shaped(x0k), shaped(x1k), shaped(b.x2),
        ),
        alpha=float(cfg.flip_blend), dtv=float(cfg.dt),
        prepadded0=pre0,
        prepadded1=pre1,
    ).reshape(r0 * r1, tk3.G2P_UPD, k)
    x0_new = out[:, 0] if x0_shift is None else out[:, 0] + x0_shift
    x1_new = out[:, 1] if x1_shift is None else out[:, 1] + x1_shift
    return dataclasses.replace(
        b,
        x0=x0_new, x1=x1_new, x2=out[:, 2],
        v0=out[:, 3], v1=out[:, 4], v2=out[:, 5],
        C00=out[:, 6], C01=out[:, 7], C02=out[:, 8],
        C10=out[:, 9], C11=out[:, 10], C12=out[:, 11],
        C20=out[:, 12], C21=out[:, 13], C22=out[:, 14],
        J=out[:, 15],
    )


def substep(
    b: FluidBuckets3D, scene: Scene, spec: FastSpec3D, domain=None, t=None
) -> FluidBuckets3D:
    cfg = scene.cfg
    assert cfg.dim == 3
    tent = cfg.kernel == KernelKind.TENT
    g = cfg.num_grids
    r0, r1 = spec.rows0, spec.rows1
    k = spec.capacity
    dt = jnp.float32(cfg.dt)
    dx = float(cfg.dx)
    dinv = float(4.0 * cfg.inv_dx * cfg.inv_dx)
    apic = cfg.transfer == TransferKind.APIC
    if domain is not None:
        # Slab shard (parallel/fast_domain3d.py): kernels index axis-0
        # bucket rows locally, so shift positions by the slab origin; the
        # fused G2P advects the SHIFTED x0 and the caller's origin is
        # added back exactly (dead slots: (0 - a) + a == 0 in fp).
        lo = jax.lax.axis_index(domain.axis0) * r0
        x0_shift = lo.astype(jnp.float32) * jnp.float32(dx)
        x0k = b.x0 - x0_shift
        row_index0 = lo - 1 + jnp.arange(r0 + 4)
    else:
        x0_shift = None
        x0k = b.x0
        row_index0 = None
    if domain is not None and domain.axis1 is not None:
        # Two-axis decomposition (slabs x pencil columns): axis 1 is also
        # a local window — same shift/halo treatment as axis 0, and the
        # P2G emits the axis-1 halo plane (transfer3d halo1 mode).
        lo1 = jax.lax.axis_index(domain.axis1) * r1
        x1_shift = lo1.astype(jnp.float32) * jnp.float32(dx)
        x1k = b.x1 - x1_shift
        row_index1 = lo1 - 1 + jnp.arange(r1 + 4)
        halo1 = True
    else:
        x1_shift = None
        x1k = b.x1
        row_index1 = None
        halo1 = False

    cmat = [[getattr(b, f"C{a}{c}") for c in range(3)] for a in range(3)]
    fmat = [getattr(b, f"F{a}{c}") for a in range(3) for c in range(3)]
    div_lag = cmat[0][0] + cmat[1][1] + cmat[2][2]
    shaped = lambda a: a.reshape(r0, r1, k)
    counts = jnp.sum(b.mask > 0, axis=1).astype(jnp.int32)
    # Grid coordinates are computed ONCE here and fed to BOTH kernels:
    # in-kernel gx arithmetic let Mosaic's FMA rounding give P2G and G2P
    # different stencil tap sets on knife-edge columns (exponential
    # energy growth; see transfer3d._p2g3d_chunk).
    invf, padf = jnp.float32(cfg.inv_dx), jnp.float32(PAD)
    gxs = (
        shaped(x0k * invf + padf),
        shaped(x1k * invf + padf),
        shaped(b.x2 * invf + padf),
    )

    # ---- stress: component-form material dispatch (fast2d.py pattern) --
    ratio = float(cfg.pressure_mixing_ratio)
    ext = bool(cfg.use_fbar or ratio > 0.0)
    # Single-fluid non-stabilized configs (the BASELINE headline workload)
    # run FULLY fused: stress inside P2G, particle update inside G2P — no
    # slot-sized XLA pass pays the capacity/occupancy padding (~3.7x at
    # the 8M slab).
    # (Tent runs the generic path: the fused update-mode G2P computes J
    # from the in-kernel C, which for the hat kernel needs the matrix
    # D^-1 reconstruction below.)
    # Grid-side extensions (CSF / incompressible projection) run in XLA on
    # the updated planes: the in-kernel grid-update paths stand down.
    # Rigid colliders do NOT: their pointwise BC runs IN the
    # rolling-scratch kernel (transfer3d._p2g3d_grid_kernel, ROADMAP
    # lever 11) — unless the incompressible projection also needs the
    # collider solid mask on the XLA planes.
    ext_grid = cfg.incompressible or cfg.surface_tension > 0.0
    col_kernel = tuple(scene.colliders) if scene.colliders else ()
    tcol = None
    if col_kernel and t is not None:
        from mpm_flip98a_tpu.models import colliders as _colm

        if _colm.any_moving(col_kernel):
            tcol = t
    fused = (
        scene.materials_present == (mat.WEAKLY_COMPRESSIBLE_FLUID,)
        and not ext
        and not tent
        and not ext_grid
    )
    if fused:
        fields = (
            *gxs,
            shaped(b.v0), shaped(b.v1), shaped(b.v2),
            *(shaped(cmat[a][c]) for a in range(3) for c in range(3)),
            shaped(b.J), shaped(b.mass), shaped(b.vol0),
        )
        eos_name = "linear" if scene.params.eos == EOSKind.LINEAR else "tait"
        import os as _os
        if (
            domain is None and scene.mass_floor > 0.0
            and _os.environ.get("MPM_P2G_GRID", "1") != "0"
        ):
            # Single chip: fused P2G + fold + grid update in ONE kernel
            # (rolling-scratch accumulation — no expanded intermediate,
            # no XLA fold/update passes, G2P-ready padded output).
            grav = tuple(
                float(x) for x in cfg.gravity_acceleration(scene.physics)
            )
            wall = "penalty" if cfg.use_penalty_ebc else scene.wall.kind
            beta = (
                float(cfg.penalty_parameter(scene.physics))
                if cfg.use_penalty_ebc else 0.0
            )
            grid_pad = tk3.p2g3d_grid(
                fields, counts, r1, g, dx,
                apic=apic, stress=eos_name,
                kb=float(scene.params.bulk_modulus),
                mu=float(scene.params.dynamic_viscosity),
                gamma=float(scene.params.tait_gamma),
                fa=float(-cfg.dt * dinv),
                dt=float(cfg.dt), grav=grav,
                floor=float(scene.mass_floor),
                lo=int(PAD), hi=g - 1 - int(PAD), wall=wall, beta=beta,
                colliders=col_kernel, tcol=tcol,
            )
            return _finish_substep(
                b, scene, spec, None, counts, gxs, grid_pad=grid_pad,
            )
        # Sharded: the rolling-scratch kernel still folds in-VMEM, but
        # emits RAW halo-layout sums (the exchange must see them).
        raw_halo = tk3.p2g3d_grid(
            fields, counts, r1, g, dx,
            apic=apic, stress=eos_name,
            kb=float(scene.params.bulk_modulus),
            mu=float(scene.params.dynamic_viscosity),
            gamma=float(scene.params.tait_gamma),
            fa=float(-cfg.dt * dinv),
            raw=True,
        )
        return _finish_substep(
            b, scene, spec, None, counts, gxs, domain, x0k, x0_shift,
            row_index0, x1k, x1_shift, row_index1, raw_halo=raw_halo, t=t,
        )
    # Semi-implicit lag correction on the fused nodal averages (see
    # fast2d.substep: advance by the known local rates; div = tr C).
    jbar_adv = b.jbar_s * (1.0 + dt * div_lag) if ext else b.jbar_s
    jeff = jbar_adv if cfg.use_fbar else b.J
    vj = b.vol0 * jeff
    p_point_out = jnp.zeros_like(b.J)
    tau = [[jnp.zeros_like(b.J) for _ in range(3)] for _ in range(3)]
    for mid in scene.materials_present:
        # `tl` (NOT `t`): the simulation-time parameter `t` must survive
        # this loop — it feeds kinematic colliders in _grid_update below.
        tl = [[None] * 3 for _ in range(3)]
        if mid == mat.WEAKLY_COMPRESSIBLE_FLUID:
            kb = jnp.float32(scene.params.bulk_modulus)
            mu = jnp.float32(scene.params.dynamic_viscosity)
            if scene.params.eos == EOSKind.LINEAR:
                p_point = -kb * (jeff - 1.0)
            else:
                gamma = jnp.float32(scene.params.tait_gamma)
                j_safe = jnp.maximum(jeff, jnp.float32(1e-3))
                p_point = (kb / gamma) * ((1.0 / j_safe) ** gamma - 1.0)
            p_point_out = p_point
            if ratio > 0.0:
                if scene.params.eos == EOSKind.LINEAR:
                    dp_dt = -kb * jeff * div_lag
                else:
                    dp_dt = -kb * (1.0 / j_safe) ** gamma * div_lag
                pressure = ratio * (b.p_s + dt * dp_dt) + (1.0 - ratio) * p_point
            else:
                pressure = p_point
            for a in range(3):
                for c in range(3):
                    dev = 0.5 * (cmat[a][c] + cmat[c][a]) - (
                        div_lag / 3.0 if a == c else 0.0
                    )
                    tl[a][c] = vj * (
                        (-pressure if a == c else 0.0) + 2.0 * mu * dev
                    )
        elif mid == mat.SAND:
            # Drucker-Prager sand (materials.sand_tau_hat) on stacked
            # (..., 3, 3) matrices — the SVD-based Hencky stress has no
            # cheap component form; sand is not the headline bench path.
            # Dead slots sit at F = I (eps = 0, tau = 0).
            fm_s = jnp.stack(
                [jnp.stack(fmat[3 * a : 3 * a + 3], -1) for a in range(3)],
                -2,
            )
            tm_s = mat.sand_tau_hat(scene.params, b.vol0, fm_s)
            for a in range(3):
                for c in range(3):
                    tl[a][c] = tm_s[..., a, c]
        elif mid == mat.NEO_HOOKEAN:
            # tau = V0 (mu (F F^T - I) + lam log(Jf) I)
            mu_s = jnp.float32(scene.params.mu)
            lam_s = jnp.float32(scene.params.lam)
            jf = (
                fmat[0] * (fmat[4] * fmat[8] - fmat[5] * fmat[7])
                - fmat[1] * (fmat[3] * fmat[8] - fmat[5] * fmat[6])
                + fmat[2] * (fmat[3] * fmat[7] - fmat[4] * fmat[6])
            )
            lj = lam_s * jnp.log(jnp.maximum(jf, jnp.float32(1e-6)))
            for a in range(3):
                for c in range(3):
                    ffr = sum(fmat[3 * a + e] * fmat[3 * c + e] for e in range(3))
                    tl[a][c] = b.vol0 * (
                        mu_s * (ffr - (1.0 if a == c else 0.0))
                        + (lj if a == c else 0.0)
                    )
        else:  # FIXED_COROTATED / SNOW: V0 (2 mu (F-R) F^T + lam (Jf-1) Jf I)
            mu_s = jnp.float32(scene.params.mu)
            lam_s = jnp.float32(scene.params.lam)
            if mid == mat.SNOW:
                # Hardening-scaled Lame parameters from the tracked
                # plastic volume (mls-mpm88-explained.cpp:67-69).
                h = jnp.exp(jnp.float32(scene.params.hardening) * (1.0 - b.Jp))
                mu_s = mu_s * h
                lam_s = lam_s * h
            rrot = _polar3d_rows(fmat)
            jf = (
                fmat[0] * (fmat[4] * fmat[8] - fmat[5] * fmat[7])
                - fmat[1] * (fmat[3] * fmat[8] - fmat[5] * fmat[6])
                + fmat[2] * (fmat[3] * fmat[7] - fmat[4] * fmat[6])
            )
            lj = lam_s * (jf - 1.0) * jf
            for a in range(3):
                for c in range(3):
                    dfr = sum(
                        (fmat[3 * a + e] - rrot[3 * a + e]) * fmat[3 * c + e]
                        for e in range(3)
                    )
                    tl[a][c] = b.vol0 * (
                        2.0 * mu_s * dfr + (lj if a == c else 0.0)
                    )
        if len(scene.materials_present) == 1:
            tau = tl
        else:
            sel = b.mat == mid
            for a in range(3):
                for c in range(3):
                    tau[a][c] = jnp.where(sel, tl[a][c], tau[a][c])

    fa = -dt * jnp.float32(dinv)
    m = b.mass * b.mask
    if apic:
        p_aff = [[b.mass * cmat[a][c] * b.mask for c in range(3)] for a in range(3)]
    else:
        z = jnp.zeros_like(b.J)
        p_aff = [[z] * 3 for _ in range(3)]
    q_aff = [
        [p_aff[a][c] + fa * tau[a][c] * b.mask for c in range(3)] for a in range(3)
    ]

    # Unstacked kernel inputs, each a free (R0, R1, K) view of the bucket
    # arrays — no channel-stack relayout pass (transfer3d.py note 2).
    ext_fields = ()
    if ext:
        v0m = b.vol0 * b.mask
        ext_fields = (
            shaped(v0m * b.J), shaped(v0m),
            shaped(v0m * p_point_out), shaped(v0m * div_lag),
        )
    fields = (
        *gxs,
        shaped(m * b.v0), shaped(m * b.v1), shaped(m * b.v2),
        *((shaped(p_aff[a][c]) for a in range(3) for c in range(3)) if apic else ()),
        *(shaped(q_aff[a][c]) for a in range(3) for c in range(3)),
        shaped(m),
        *ext_fields,
    )

    # ---- P2G + fold + grid update (rolling-scratch kernel) --------------
    if domain is not None:
        # Sharded: in-VMEM fold, RAW halo-layout output for the exchange.
        raw_halo = tk3.p2g3d_grid(
            fields, counts, r1, g, dx, apic=apic, ext=ext, tent=tent,
            raw=True,
        )
        gs = domain.halo_sync(raw_halo)
        ri1 = row_index1 if row_index1 is not None else jnp.arange(r1 + 4) - 1
        grid_ch = _grid_update(gs, scene, ext, row_index0, ri1, domain, t)
        pre0 = pre1 = True
    elif scene.mass_floor > 0.0 and not ext_grid and __import__("os").environ.get(
        "MPM_P2G_GRID", "1"
    ) != "0":
        # Single chip: fully fused P2G + fold + grid update, G2P-ready
        # padded output (needs the ABSOLUTE mass floor as a static).
        grav = tuple(float(x) for x in cfg.gravity_acceleration(scene.physics))
        wall = "penalty" if cfg.use_penalty_ebc else scene.wall.kind
        beta = (
            float(cfg.penalty_parameter(scene.physics))
            if cfg.use_penalty_ebc else 0.0
        )
        grid_ch = tk3.p2g3d_grid(
            fields, counts, r1, g, dx, apic=apic, ext=ext, tent=tent,
            dt=float(cfg.dt), grav=grav, floor=float(scene.mass_floor),
            lo=int(PAD), hi=g - 1 - int(PAD), wall=wall, beta=beta,
            colliders=col_kernel, tcol=tcol,
        )
        pre0 = pre1 = True
    else:
        expanded = tk3.p2g3d(
            fields, counts, r1, g, dx, apic=apic, ext=ext, tent=tent,
            halo1=halo1,
        )
        gs = tk3.fold_rows0(expanded)
        grid_ch = _grid_update(gs, scene, ext, row_index0, row_index1, t=t)
        pre0 = pre1 = False

    # ---- G2P ------------------------------------------------------------
    nout = tk3.G2P_OUT_EXT if ext else tk3.G2P_OUT
    out = tk3.g2p3d(
        *gxs, shaped(b.mask),
        counts, grid_ch, dx, 1.0 if tent else dinv, ext=ext,
        prepadded0=pre0, prepadded1=pre1, tent=tent,
    ).reshape(r0 * r1, nout, spec.capacity)
    vpic = [out[:, a] for a in range(3)]
    vold = [out[:, 3 + a] for a in range(3)]
    c_new = [out[:, 6 + i] for i in range(9)]
    if tent:
        # C = B D^-1: with dinv = 1 the kernel returned the raw B matrix;
        # the hat kernel's APIC D is matrix-valued (same convention as
        # fast2d / the general path's mm(b_mat, inv(d_mat))).  D is
        # separable for a tensor-product kernel: D_aa = s2(gx_a),
        # D_ab = s1(gx_a) s1(gx_b).
        from mpm_flip98a_tpu.ops.pallas.transfer2d import _axis_weights_tent

        dxf = jnp.float32(dx)

        def axis_d(gx):
            base = jnp.floor(gx - 0.5)
            fx = gx - base
            w = _axis_weights_tent(fx)
            s1 = sum(w[i] * (i - fx) for i in range(3)) * dxf
            s2 = sum(w[i] * (i - fx) ** 2 for i in range(3)) * dxf * dxf
            return s1, s2

        flat = lambda a: a.reshape(r0 * r1, k)
        s0_1, d00 = axis_d(flat(gxs[0]))
        s1_1, d11 = axis_d(flat(gxs[1]))
        s2_1, d22 = axis_d(flat(gxs[2]))
        eps = jnp.float32(1e-12)
        d00, d11, d22 = d00 + eps, d11 + eps, d22 + eps
        d01, d02, d12 = s0_1 * s1_1, s0_1 * s2_1, s1_1 * s2_1
        co00 = d11 * d22 - d12 * d12
        co01 = d02 * d12 - d01 * d22
        co02 = d01 * d12 - d02 * d11
        co11 = d00 * d22 - d02 * d02
        co12 = d01 * d02 - d00 * d12
        co22 = d00 * d11 - d01 * d01
        det = d00 * co00 + d01 * co01 + d02 * co02
        dinv_m = [
            [co00 / det, co01 / det, co02 / det],
            [co01 / det, co11 / det, co12 / det],
            [co02 / det, co12 / det, co22 / det],
        ]
        bmat = c_new
        c_new = [
            sum(bmat[3 * a + e] * dinv_m[e][c] for e in range(3))
            for a in range(3)
            for c in range(3)
        ]

    alpha = jnp.float32(cfg.flip_blend)
    nv = [
        alpha * (vv + vp - vo) + (1 - alpha) * vp
        for vv, vp, vo in zip((b.v0, b.v1, b.v2), vpic, vold)
    ]
    div_new = c_new[0] + c_new[4] + c_new[8]
    if ratio > 0.0:
        div_for_j = ratio * b.div_s + (1.0 - ratio) * div_new
    else:
        div_for_j = div_new
    if ext:
        jbar_new = jnp.where(b.mask > 0, out[:, 15], 1.0)
        p_new = out[:, 16] * b.mask
        div_s_new = out[:, 17] * b.mask
    else:
        jbar_new, p_new, div_s_new = b.jbar_s, b.p_s, b.div_s
    jp_new = b.Jp
    # F <- (I + dt C) F, component form.  Fluid stress never reads F (it
    # uses C and J), so fluid-only scenes skip the 9-field update entirely
    # (~2.4 GB/substep of dead traffic at 8M).
    if scene.materials_present == (mat.WEAKLY_COMPRESSIBLE_FLUID,):
        f_new = fmat
    else:
        f_new = [
            sum(
                ((1.0 if a == e else 0.0) + dt * c_new[3 * a + e]) * fmat[3 * e + c]
                for e in range(3)
            )
            for a in range(3)
            for c in range(3)
        ]
        if (scene.params.plastic and mat.FIXED_COROTATED in scene.materials_present) \
                or mat.SNOW in scene.materials_present \
                or mat.SAND in scene.materials_present:
            # Snow-plasticity singular-value clamp + Jp tracking
            # (mls-mpm88:164-177) / sand Drucker-Prager cone projection.
            # Dead slots are parked at F = I, Jp = 1, unchanged by both.
            fm = jnp.stack(
                [jnp.stack(f_new[3 * a : 3 * a + 3], -1) for a in range(3)], -2
            )
            fm, jp_new = mat.plastic_update(
                scene.params, b.mat, fm, jp_new, scene.materials_present
            )
            f_new = [fm[..., a, c] for a in range(3) for c in range(3)]
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
        F00=f_new[0], F01=f_new[1], F02=f_new[2],
        F10=f_new[3], F11=f_new[4], F12=f_new[5],
        F20=f_new[6], F21=f_new[7], F22=f_new[8],
        J=jnp.where(b.mask > 0, b.J * (1.0 + dt * div_for_j), 1.0),
        mass=b.mass,
        vol0=b.vol0,
        mat=b.mat,
        Jp=jp_new,
        jbar_s=jbar_new,
        p_s=p_new,
        div_s=div_s_new,
        mask=b.mask,
        overflow=b.overflow,
    )


def _needs_rebucket(
    b: FluidBuckets3D, cfg: MPMConfig, spec: FastSpec3D, row0=0, row1=0
) -> jax.Array:
    s, k = b.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, k), 0)
    r0 = (row0 + rows // spec.rows1).astype(jnp.float32)
    r1 = (row1 + rows % spec.rows1).astype(jnp.float32)
    gx0 = b.x0 * jnp.float32(cfg.inv_dx) + jnp.float32(PAD)
    gx1 = b.x1 * jnp.float32(cfg.inv_dx) + jnp.float32(PAD)
    d0 = jnp.where(b.mask > 0, gx0 - 0.5 - r0, 0.5)
    d1 = jnp.where(b.mask > 0, gx1 - 0.5 - r1, 0.5)
    bad = (d0 <= -0.8) | (d0 >= 1.8) | (d1 <= -0.8) | (d1 >= 1.8)
    return jnp.any(bad)


@partial(jax.jit, static_argnames=("scene", "spec", "n_substeps"))
def run(
    b: FluidBuckets3D, scene: Scene, spec: FastSpec3D, n_substeps: int, t0=None
) -> FluidBuckets3D:
    from mpm_flip98a_tpu.models import colliders as _col

    moving = (
        t0 is not None
        and scene.colliders
        and _col.any_moving(scene.colliders)
    )

    if _os.environ.get("MPM_RUN_WHILE", "1") == "1":
        # DEFAULT since round 5 — same structure as fast2d.run: margin
        # check as the inner while predicate, rebucket cond hoisted out
        # of the hot body; identical substep/rebucket sequence
        # (bit-exact — tests/test_fast3d.py pins it).  Measured on chip
        # 2026-08-19: 3D full 2.917e9 vs 2.775e9 fori+cond
        # (docs/measurements/r5_mega.log).  MPM_RUN_WHILE=0 = fori A/B.
        # Carry-flag structure (see fast2d.run): the margin check fuses
        # into the body's particle update; the predicate reads a scalar.
        def inner_cond(c):
            j, s, flag = c
            return jnp.logical_and(j < n_substeps, ~flag)

        def inner_body(c):
            j, s, _ = c
            t = jnp.asarray(t0) + j * scene.cfg.dt if moving else None
            s = substep(s, scene, spec, t=t)
            return j + 1, s, _needs_rebucket(s, scene.cfg, spec)

        def outer_cond(c):
            j, _, _ = c
            return j < n_substeps

        def outer_body(c):
            j, s, flag = c
            j, s, flag = jax.lax.while_loop(
                inner_cond, inner_body, (j, s, flag)
            )

            def fix(q):
                q = rebucket(q, scene.cfg, spec)
                t = jnp.asarray(t0) + j * scene.cfg.dt if moving else None
                q = substep(q, scene, spec, t=t)
                return q, _needs_rebucket(q, scene.cfg, spec)

            s, flag = jax.lax.cond(
                j < n_substeps, fix, lambda q: (q, flag), s
            )
            j = jnp.minimum(j + 1, n_substeps)
            return j, s, flag

        return jax.lax.while_loop(
            outer_cond, outer_body,
            (0, b, _needs_rebucket(b, scene.cfg, spec)),
        )[1]

    def body(i, st):
        st = jax.lax.cond(
            _needs_rebucket(st, scene.cfg, spec),
            lambda s: rebucket(s, scene.cfg, spec),
            lambda s: s,
            st,
        )
        t = jnp.asarray(t0) + i * scene.cfg.dt if moving else None
        return substep(st, scene, spec, t=t)

    return jax.lax.fori_loop(0, n_substeps, body, b)
