"""Fused 3D P2G / G2P Pallas TPU kernels over pencil-bucketed particles.

3D extension of the 2D row-bucket design (transfer2d.py): particles are
bucketed by their (base row0, base row1) pencil — one bucket per (x, y)
grid line, K slots each — and each Pallas program turns the axis-2 (z)
scatter/gather of one pencil into one-hot weight-matrix products on the
MXU.  Axis 0 and axis 1 use the +-1-bucket drift margin, so a particle's
3x3 stencil rows land in 5x5 candidate target pencils.

Round-2 redesign (profiled on v5e at the BASELINE 8M/256^3 scale, where
the round-1 kernels spent ~70% of their time on per-program fixed costs
across ~520k programs):

1. PENCIL BATCHING: each program owns B1 adjacent axis-1 pencils and all
   their slot-axis chunks, looping over (pencil, chunk) in the body with
   per-chunk count skipping.  Program counts drop ~30x; the per-pair
   matmul work per particle is unchanged (relative-target structure is
   kept — absolute-row batching would grow the 5x expansion to B1+4).
2. UNSTACKED INPUTS: the kernels read the bucketed state/affine arrays as
   separate (R0, R1, K) refs instead of a stacked (R0, R1, CH, K) pdata —
   the 26-channel stack/relayout pass (~50 ms at 8M) disappears and PIC
   configs skip the 9 P-affine refs entirely.
3. SECOND WEIGHT MATRIX: the z-column affine term used to cost 2 extra
   A rows per channel via the rank-1 fold  A2 @ (W * (c - gx2)) =
   (A2 @ W) * c - (A2 * gx2) @ W.  Building W2 = W * (c - gx2) * dx in
   VMEM (2 VPU ops) and running a second small matmul replaces 12 rows
   per target pair with 3 (PIC) / 6 (APIC): P2G drops from 20 to 10-17
   A rows per pair, G2P from 12 to 9-12 gather rows per pair.

4. FUSED ENDPOINTS: for the single-fluid non-ext configs (the BASELINE
   headline), P2G computes the fluid stress in-chunk from raw state
   (stress="linear"/"tait") and G2P applies the particle update in-chunk
   (state=(v, J): FLIP blend, advection, J update) — dead bucket slots
   (capacity/occupancy inflation ~3.7x at the 8M slab) never touch an
   XLA elementwise pass.

Channel conventions (weakly-compressible FLIP98A fluid, 3D):
  P2G in  : x (3), m v (3), [P00..P22 (9) if APIC], Q00..Q22 (9), m,
            [V0 J, V0, V0 p, V0 div if ext]   (each (R0, R1, K));
            fused-stress mode instead: x (3), v (3), C (9), J, mass, V0
            P = m C (APIC affine), Q = P - dt Dinv tau (affine + force)
  P2G out : (R0, 5, G1, nch, G2) -> fold_rows0 -> (G0, G1, nch, G2)
            (grid-row-major = the G2P grid layout; channels
            [m v (3 pure), m v + f (3 forced), m] + ext)
  G2P in  : x (3), mask [, v (3), J in update mode]; grid
            (R0+4, R1+4, gch, G2) pre-padded,
            gch = 6 [v_new (3), v0 (3)] or 9 (+ Jbar, p, div)
  G2P out : (R0, R1, nout, K) = [vpic (3), v0g (3), C (9)]
            (+ ext gathers [Jbar, p, div]), nout = 15 or 18; update
            mode: [x (3), v (3), C (9), J], nout = 16

Reference analogue: the per-particle scatter/gather loops of
cpp_validation/mls-mpm88-explained.cpp:53-102,133-179 generalized to 3D.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpm_flip98a_tpu.ops.pallas.transfer2d import (
    _col_weights,
    _dot,
    _interpret,
    _row_weights,
    _taps,
)

NT = 5
P2G_CH = 7            # mv_pure(3), mv_forced(3), m
P2G_CH_EXT = 11       # + V0 J, V0, V0 p, V0 div
G2P_CH = 6            # v_new(3), v0(3)
G2P_CH_EXT = 9        # + Jbar, p, div
G2P_OUT = 15          # vpic(3), v0g(3), C(9)
G2P_OUT_EXT = 18      # + jbar, p, div
G2P_UPD = 16          # fused-update mode: x(3), v(3), C(9), J


def _batch1(r1: int) -> int:
    """Pencils per program.  The TPU block-shape rule requires the sublane
    dim of a (1, b1, K) particle block to be a multiple of 8 or the full
    r1, so batch 8 when possible and fall back to whole-row batching for
    tiny grids (CPU tests)."""
    if r1 % 8 == 0:
        return 8
    assert r1 <= 16, f"3D fast path needs num_grids % 8 == 0 (got r1={r1})"
    return r1


def _chunk3d(k: int) -> int:
    """Slot-axis chunk: 128 up to K = 512 (finest count-skip granularity),
    K/4 beyond (bounds the in-body unroll at 4 chunk bodies).

    MPM_KC3D overrides the chunk size for on-chip A/B probes (VERDICT r3
    item 3)."""
    import os as _os

    env = _os.environ.get("MPM_KC3D")
    if env:
        kc = int(env)
        while k % kc:
            kc -= 1
        return max(kc, 1)
    kc = max(128, k // 4)
    assert k % kc == 0, k
    return kc


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------


def _p2g3d_kernel(
    counts_ref,
    *refs,
    r1: int,
    b1: int,
    g1: int,
    g2t: int,
    dx: float,
    kc: int,
    apic: bool,
    ext: bool,
    stress,
    kb: float,
    mu: float,
    gamma: float,
    fa: float,
    tent: bool,
    halo1: bool,
):
    out_ref = refs[-1]
    in_refs = refs[:-1]
    i0 = pl.program_id(0)
    tz = pl.program_id(1)
    gq = pl.program_id(2)

    @pl.when(gq == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    k = in_refs[0].shape[2]

    # The pencil loop is a lax loop (not a Python unroll): b1 * nk unrolled
    # chunk bodies at ~250 A rows each would blow up Mosaic compile time.
    # Dynamic pencil-row extraction uses pltpu.roll (_take_row).
    def pencil(b, carry):
        i1 = gq * b1 + b

        def emit(t0, t1, val):
            if halo1:
                # Axis-1 sharded: the output plane carries the axis-1 halo
                # (plane row j = target row j - 1, like the axis-0
                # expansion), so edge writes land in the halo instead of
                # being dropped and every target index is in range.
                out_ref[0, t0, pl.ds(i1 + t1, 1), :, :] += val[None]
            else:
                row = i1 + (t1 - 1)

                @pl.when((row >= 0) & (row < g1))
                def _(row=row, t0=t0, val=val):
                    out_ref[0, t0, pl.ds(row, 1), :, :] += val[None]

        cnt = counts_ref[i0 * r1 + i1]
        for q in range(k // kc):
            # Buckets are packed (actives first), so chunks past the count
            # hold only dead slots — skip the whole body.
            @pl.when(q * kc < cnt)
            def _(q=q):
                _p2g3d_chunk(
                    in_refs, emit, i0, i1, tz, b, q,
                    g2t=g2t, dx=dx, kc=kc,
                    apic=apic, ext=ext, stress=stress, kb=kb, mu=mu,
                    gamma=gamma, fa=fa, tent=tent,
                )
        return carry

    jax.lax.fori_loop(0, b1, pencil, 0)


def _take_row(block, b):
    """Row b of a (B, K) block for TRACED b: Mosaic has no dynamic-sublane
    load, but a dynamic sublane roll is a cheap shuffle — rotate row b to
    the top and statically slice it."""
    return pltpu.roll(block, -b, 0)[0]


def _p2g3d_chunk(
    refs, emit, i0, i1, tz, b, q,
    *, g2t, dx, kc, apic, ext, stress, kb, mu, gamma, fa, tent,
):
    sl = slice(q * kc, (q + 1) * kc)
    ld = lambda ix: _take_row(refs[ix][0], b)[sl]
    # Grid coordinates arrive PRECOMPUTED (one XLA pass feeds both
    # kernels).  Computing gx = x * inv_dx + pad in-kernel let Mosaic's
    # FMA rounding differ BETWEEN the P2G and G2P programs: on knife-edge
    # lattice columns (gx - 0.5 within 1 ulp of an integer) the two
    # kernels then disagree on the stencil tap set, particles scatter to
    # nodes they never gather from, and the asymmetric transfer pumps an
    # under-resolved 64^3 scene into exponential blowup (measured; the 2D
    # kernels always passed precomputed gx, which is why 2D was stable).
    gx0, gx1, gx2 = ld(0), ld(1), ld(2)
    if stress is not None:
        # Fused fluid stress: compute mv / P / Q from raw state in-chunk —
        # only ACTIVE chunks pay, where the XLA prep pass at 8M paid for
        # every dead slot (capacity/occupancy inflation ~3.7x measured).
        # Dead slots are neutral (mass = vol0 = 0, J = 1) so they scatter
        # exact zeros without a mask.
        v3 = (ld(3), ld(4), ld(5))
        cm = tuple(ld(6 + i) for i in range(9))
        jj = ld(15)
        mass = ld(16)
        vol0 = ld(17)
        mv = tuple(mass * v3[a] for a in range(3))
        if stress == "linear":
            pressure = -kb * (jj - 1.0)
        else:  # tait
            j_safe = jnp.maximum(jj, jnp.float32(1e-3))
            pressure = (kb / gamma) * ((1.0 / j_safe) ** gamma - 1.0)
        divc = cm[0] + cm[4] + cm[8]
        vj = vol0 * jj
        p_aff = tuple(mass * cm[i] for i in range(9)) if apic else None
        q_aff = []
        for a in range(3):
            for c in range(3):
                dev = 0.5 * (cm[3 * a + c] + cm[3 * c + a]) - (
                    divc / 3.0 if a == c else 0.0
                )
                tau = vj * ((-pressure if a == c else 0.0) + 2.0 * mu * dev)
                q_aff.append((p_aff[3 * a + c] if apic else 0.0) + fa * tau)
        q_aff = tuple(q_aff)
        extras = ()
    else:
        mv = (ld(3), ld(4), ld(5))
        if apic:
            p_aff = tuple(ld(6 + i) for i in range(9))
            qbase = 15
        else:
            p_aff = None
            qbase = 6
        q_aff = tuple(ld(qbase + i) for i in range(9))
        mass = ld(qbase + 9)
        extras = tuple(ld(qbase + 10 + e) for e in range(4)) if ext else ()

    base0 = jnp.floor(gx0 - 0.5)
    base1 = jnp.floor(gx1 - 0.5)
    rel0 = base0 - i0.astype(jnp.float32)
    rel1 = base1 - i1
    valid = (
        (rel0 >= -1.0) & (rel0 <= 1.0) & (rel1 >= -1.0) & (rel1 <= 1.0)
    ).astype(jnp.float32)
    w0 = _taps(gx0 - base0, tent)
    w1 = _taps(gx1 - base1, tent)

    # Arithmetic column weights (transfer2d._col_weights) — no one-hot
    # compare-selects, and the signed distance is shared with the W2
    # (z-column affine) matrix.
    col0 = tz * g2t
    colv = col0 + jax.lax.broadcasted_iota(jnp.int32, (kc, g2t), 1).astype(jnp.float32)
    dcol = colv - gx2[:, None]
    w_mat = _col_weights(dcol, tent)
    w_mat2 = w_mat * (dcol * dx)

    wr0 = [_row_weights(rel0, w0, valid, t) for t in range(NT)]
    wr1 = [_row_weights(rel1, w1, jnp.ones_like(valid), t) for t in range(NT)]
    rdp0 = [(i0.astype(jnp.float32) + float(t - 1) - gx0) * dx for t in range(NT)]
    rdp1 = [(i1 + float(t - 1) - gx1) * dx for t in range(NT)]

    nch = P2G_CH_EXT if ext else P2G_CH
    na2 = 6 if apic else 3
    # Blockwise A build (same restructure as transfer2d._p2g_core): the
    # rdp-independent factor U and the two drift-direction coefficient
    # blocks V0/V1 are assembled once per chunk; each target pair is then
    # wr * (U + rdp0 V0 + rdp1 V1) on the affine rows — three fused
    # (rows, K) ops instead of ~10 per-row (K,) builds and a 175-way
    # stack.
    naff = 6 if apic else 3
    aoff = 0 if apic else 3
    if apic:
        u_aff = jnp.stack([mv[0], mv[1], mv[2], mv[0], mv[1], mv[2]])
        v0_aff = jnp.stack([p_aff[0], p_aff[3], p_aff[6],
                            q_aff[0], q_aff[3], q_aff[6]])
        v1_aff = jnp.stack([p_aff[1], p_aff[4], p_aff[7],
                            q_aff[1], q_aff[4], q_aff[7]])
        w2rows = jnp.stack([p_aff[2], p_aff[5], p_aff[8],
                            q_aff[2], q_aff[5], q_aff[8]])
    else:
        u_aff = jnp.stack([mv[0], mv[1], mv[2]])
        v0_aff = jnp.stack([q_aff[0], q_aff[3], q_aff[6]])
        v1_aff = jnp.stack([q_aff[1], q_aff[4], q_aff[7]])
        w2rows = jnp.stack([q_aff[2], q_aff[5], q_aff[8]])
    u_plain = jnp.stack([mv[0], mv[1], mv[2], mass] + list(extras)) if not apic \
        else jnp.stack([mass] + list(extras))

    blocks1 = []
    blocks2 = []
    for t0 in range(NT):
        for t1 in range(NT):
            wr = wr0[t0] * wr1[t1]
            a_aff = wr[None, :] * (
                u_aff + rdp0[t0][None, :] * v0_aff + rdp1[t1][None, :] * v1_aff
            )
            a_plain = wr[None, :] * u_plain
            if apic:
                blocks1.append(jnp.concatenate([a_aff, a_plain], axis=0))
            else:
                # PIC row order: pure momentum (no affine), forced
                # momentum (affine), mass/extras.
                blocks1.append(
                    jnp.concatenate([a_plain[:3], a_aff, a_plain[3:]], axis=0)
                )
            blocks2.append(wr[None, :] * w2rows)

    o1 = _dot(jnp.concatenate(blocks1, axis=0), w_mat)
    o2 = _dot(jnp.concatenate(blocks2, axis=0), w_mat2)

    zpad = jnp.zeros((nch - 6, o1.shape[1]), jnp.float32)
    z3 = jnp.zeros((3, o1.shape[1]), jnp.float32)

    def pair_val(t0, t1):
        pr = t0 * NT + t1
        b1o = pr * nch
        b2o = pr * na2
        # One (nch, G2T) accumulate per target pair: the z-column matmul
        # rows add onto the momentum channels (pure+forced for APIC,
        # forced only for PIC).
        add2 = o2[b2o : b2o + na2, :]
        if not apic:
            add2 = jnp.concatenate([z3, add2], axis=0)
        return o1[b1o : b1o + nch, :] + jnp.concatenate([add2, zpad], axis=0)

    for t0 in range(NT):
        for t1 in range(NT):
            emit(t0, t1, pair_val(t0, t1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "g1", "g2", "dx", "apic", "ext",
        "stress", "kb", "mu", "gamma", "fa", "tent", "halo1",
    ),
)
def p2g3d(
    fields: tuple,
    counts: jax.Array,
    g1: int,
    g2: int,
    dx: float,
    apic: bool = True,
    ext: bool = False,
    stress=None,
    kb: float = 0.0,
    mu: float = 0.0,
    gamma: float = 7.0,
    fa: float = 0.0,
    tent: bool = False,
    halo1: bool = False,
) -> jax.Array:
    """fields: tuple of (R0, R1, K) arrays in the P2G channel order above;
    counts (R0*R1,) int32 -> (R0, 5, G1, nch, G2) — grid-row-major so the
    fold's result is already in the G2P grid layout (no transposes).

    halo1=True (axis-1 slab shard, parallel/fast_domain3d.py): the axis-1
    plane is emitted UNcropped as G1 + 4 rows (plane row j = target row
    j - 1), so edge writes land in halo rows for the exchange instead of
    being dropped at the local window boundary."""
    r0, r1, k = fields[0].shape
    nch = P2G_CH_EXT if ext else P2G_CH
    if stress is not None:
        # Fused-stress mode: raw state refs [x3, v3, C9, J, mass, vol0].
        assert not ext and stress in ("linear", "tait")
        n_in = 18
    else:
        n_in = 3 + 3 + (9 if apic else 0) + 9 + 1 + (4 if ext else 0)
    assert len(fields) == n_in, (len(fields), n_in)
    kc = _chunk3d(k)
    b1 = _batch1(r1)
    # Tile the z axis of the plane output block so it fits in VMEM
    # (~6 MB cap: the kernel body needs ~9 MB of scoped VMEM for its
    # A/W/o temporaries on top — a 9.2 MB untiled block OOMs the 16 MB
    # budget, measured at 256^3).
    g1out = g1 + NT - 1 if halo1 else g1
    cap_mb = float(__import__("os").environ.get("MPM_P2G3D_BLOCK_MB", "6"))
    n_tz = 1
    while NT * nch * g1out * (g2 // n_tz) * 4 > cap_mb * 1024 * 1024:
        n_tz *= 2
    assert g2 % n_tz == 0, (g2, n_tz)
    g2t = g2 // n_tz
    # counts rides as a PLAIN SMEM operand, NOT scalar prefetch: two
    # PrefetchScalarGridSpec kernels in one XLA program clobbered each
    # other's prefetched scalars on the TPU toolchain (bit-stable missing
    # chunk-skips => whole pencil rows of mass lost; see docs/PERF.md).
    # No index map reads the scalars, so prefetch is unnecessary anyway.
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(
            (1, b1, k),
            lambda i, tz, gq: (i, gq, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_in)
    ]
    return pl.pallas_call(
        functools.partial(
            _p2g3d_kernel,
            r1=r1, b1=b1, g1=g1, g2t=g2t,
            dx=dx, kc=kc, apic=apic, ext=ext,
            stress=stress, kb=kb, mu=mu, gamma=gamma, fa=fa, tent=tent,
            halo1=halo1,
        ),
        grid=(r0, n_tz, r1 // b1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, NT, g1out, nch, g2t),
            lambda i, tz, gq: (i, 0, 0, 0, tz),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((r0, NT, g1out, nch, g2), jnp.float32),
        interpret=_interpret(),
    )(counts, *fields)


def _p2g3d_grid_kernel(
    counts_ref,
    *refs,
    r0: int,
    r1: int,
    b1: int,
    g2t: int,
    dx: float,
    kc: int,
    apic: bool,
    stress,
    kb: float,
    mu: float,
    gamma: float,
    fa: float,
    tent: bool,
    ext: bool,
    raw: bool,
    dt: float,
    grav,
    floor: float,
    lo: int,
    hi: int,
    wall: str,
    beta: float,
    colliders: tuple = (),
    kin: bool = False,
):
    """Rolling-scratch P2G + fold [+ grid update] — see p2g3d_grid."""
    out_ref = refs[-2]
    scratch = refs[-1]
    if kin:
        t_ref = refs[-3]
        in_refs = refs[:-3]
    else:
        t_ref = None
        in_refs = refs[:-2]
    tz = pl.program_id(0)
    j = pl.program_id(1)
    gq = pl.program_id(2)
    k = in_refs[0].shape[2]
    p1 = r1 + NT - 1  # plane rows (axis-1 padded: plane row = target + 1)

    @pl.when(gq == 0)
    def _emit_and_roll():
        # Program j finalizes target axis-0 row (j - 2): every contributor
        # (buckets j-3..j-1) ran in earlier programs.  Slot arithmetic:
        # slot(target) = target mod 5, and slot(j - 2) == slot(j + 3) ==
        # rem(j + 3, 5) — the emitted slot is immediately recycled for the
        # incoming target row j + 3.
        @pl.when(j == 0)
        def _():
            scratch[...] = jnp.zeros_like(scratch)

        s = jax.lax.rem(j + 3, jnp.int32(NT))
        plane = scratch[pl.ds(s, 1)][0]          # (p1, nch, g2t) sums
        if raw:
            # Halo layout: raw folded sums, UNcropped on both axes (the
            # slab shard's edge partial sums ride the exchange; matches
            # fold_rows0_halo of a halo1-mode expansion exactly).
            out_ref[0] = plane
            scratch[pl.ds(s, 1)] = jnp.zeros_like(scratch[pl.ds(s, 1)])
            return
        m = plane[:, 6]                          # (p1, g2t)
        # Crop targets outside [0, r0) exactly like fold_rows0's [1, r+1)
        # crop: top-boundary scatter rows r0..r0+2 must emit zeros.
        interior = jnp.logical_and(j >= 2, j < r0 + 2)
        has = jnp.logical_and(m > floor, interior)
        safe = jnp.where(has, m, 1.0)
        v0 = [jnp.where(has, plane[:, a] / safe, 0.0) for a in range(3)]
        # Wall bands: axis 0 = this target row (scalar), axis 1 = plane
        # row - 1, axis 2 = tz tile columns.  Same node sets as
        # fast3d._axis_bands (box faces at PAD / G-1-PAD).
        t0r = j - 2
        a0l = jnp.logical_and(t0r <= lo, interior)
        a0h = t0r >= hi
        idx1 = jax.lax.broadcasted_iota(jnp.int32, (p1, 1), 0) - 1
        a1l, a1h = idx1 <= lo, idx1 >= hi
        idx2 = tz * g2t + jax.lax.broadcasted_iota(jnp.int32, (1, g2t), 1)
        a2l, a2h = idx2 <= lo, idx2 >= hi
        if wall == "penalty":
            # (m I + dt beta n(x)n) v = m v* + dt m g: the box's penalty
            # matrix is diagonal per channel (fast3d._wall_normal_diag_ch).
            pen = [
                jnp.where(jnp.logical_or(a0l, a0h), 1.0, 0.0)
                * jnp.ones((p1, g2t), jnp.float32),
                jnp.logical_or(a1l, a1h).astype(jnp.float32)
                * jnp.ones((1, g2t), jnp.float32),
                jnp.logical_or(a2l, a2h).astype(jnp.float32)
                * jnp.ones((p1, 1), jnp.float32),
            ]
            v = [
                jnp.where(
                    has,
                    (plane[:, 3 + a] + (dt * grav[a]) * m)
                    / (m + (dt * beta) * pen[a]),
                    0.0,
                )
                for a in range(3)
            ]
        else:
            hasf = has.astype(jnp.float32)
            v = [
                jnp.where(has, plane[:, 3 + a] / safe, 0.0)
                + (dt * grav[a]) * hasf
                for a in range(3)
            ]
            if wall == "sticky":
                anyband = (
                    jnp.logical_or(jnp.logical_or(a0l, a0h), jnp.logical_or(a1l, a1h))
                    | jnp.broadcast_to(jnp.logical_or(a2l, a2h), (p1, g2t))
                )
                v = [jnp.where(anyband, 0.0, va) for va in v]
            else:  # slip: clamp the outgoing normal component per axis band
                v[0] = jnp.where(a0l, jnp.maximum(v[0], 0.0), v[0])
                v[0] = jnp.where(a0h, jnp.minimum(v[0], 0.0), v[0])
                v[1] = jnp.where(a1l, jnp.maximum(v[1], 0.0), v[1])
                v[1] = jnp.where(a1h, jnp.minimum(v[1], 0.0), v[1])
                v[2] = jnp.where(a2l, jnp.maximum(v[2], 0.0), v[2])
                v[2] = jnp.where(a2h, jnp.minimum(v[2], 0.0), v[2])
        if colliders:
            # EXTENSION (docs/ROADMAP.md lever 11): rigid SDF collider BC
            # in-kernel on the (p1, g2t) target planes, same pointwise
            # projection and placement as the XLA path (fast3d._grid_update
            # after the wall BC) — collider scenes keep the fully fused
            # pipeline.  Coordinates: axis 0 = scalar target row, axis 1 =
            # plane row - 1 ((p1, 1)), axis 2 = tz-tile columns ((1, g2t));
            # `lo` == PAD so node x = (idx - lo) * dx matches
            # colliders.node_coords.  Axis-1 pad rows (node index outside
            # [0, r1)) must stay exact zeros — re-crop after projection.
            from mpm_flip98a_tpu.models import colliders as _col

            tcol = t_ref[0] if kin else None
            coords = [
                (t0r.astype(jnp.float32) - lo) * dx,
                (idx1.astype(jnp.float32) - lo) * dx,
                (idx2.astype(jnp.float32) - lo) * dx,
            ]
            vp = _col.project(v, coords, colliders, tcol)
            keep = jnp.logical_and(
                interior, jnp.logical_and(idx1 >= 0, idx1 < r1)
            )
            v = [jnp.where(keep, vp[a], v[a]) for a in range(3)]
        for c in range(3):
            out_ref[0, :, c, :] = v[c]
            out_ref[0, :, 3 + c, :] = v0[c]
        if ext:
            # Nodal stabilizer averages (fast3d._grid_update ext branch);
            # Jbar's empty-node default (1.0) stays off the pad rows.
            v0sum = plane[:, 8]
            has_v = jnp.logical_and(v0sum > 0, interior)
            safe_v = jnp.where(has_v, v0sum, 1.0)
            jbar_dflt = jnp.where(interior, 1.0, 0.0)
            out_ref[0, :, 6, :] = jnp.where(
                has_v, plane[:, 7] / safe_v, jbar_dflt
            )
            out_ref[0, :, 7, :] = jnp.where(has_v, plane[:, 9] / safe_v, 0.0)
            out_ref[0, :, 8, :] = jnp.where(has_v, plane[:, 10] / safe_v, 0.0)
        scratch[pl.ds(s, 1)] = jnp.zeros_like(scratch[pl.ds(s, 1)])

    @pl.when(j < r0)
    def _accumulate():
        def pencil(b, carry):
            i1 = gq * b1 + b

            def emit(t0, t1, val):
                # target axis-0 row j + t0 - 1 lives in slot rem(.., 5);
                # axis-1 plane row = i1 + t1 (halo1-style padded plane).
                s = jax.lax.rem(j + t0 + jnp.int32(4), jnp.int32(NT))
                scratch[pl.ds(s, 1), pl.ds(i1 + t1, 1), :, :] += val[None, None]

            cnt = counts_ref[j * r1 + i1]
            for q in range(k // kc):
                @pl.when(q * kc < cnt)
                def _(q=q):
                    _p2g3d_chunk(
                        in_refs, emit, j, i1, tz, b, q,
                        g2t=g2t, dx=dx, kc=kc,
                        apic=apic, ext=ext, stress=stress, kb=kb, mu=mu,
                        gamma=gamma, fa=fa, tent=tent,
                    )
            return carry

        jax.lax.fori_loop(0, b1, pencil, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "g1", "g2", "dx", "apic", "stress", "kb", "mu", "gamma", "fa",
        "tent", "ext", "raw", "dt", "grav", "floor", "lo", "hi", "wall",
        "beta", "colliders",
    ),
)
def p2g3d_grid(
    fields: tuple,
    counts: jax.Array,
    g1: int,
    g2: int,
    dx: float,
    apic: bool = True,
    stress=None,
    kb: float = 0.0,
    mu: float = 0.0,
    gamma: float = 7.0,
    fa: float = 0.0,
    tent: bool = False,
    ext: bool = False,
    raw: bool = False,
    *,
    dt: float = 0.0,
    grav: tuple = (0.0, 0.0, 0.0),
    floor: float = 0.0,
    lo: int = 0,
    hi: int = 0,
    wall: str = "slip",
    beta: float = 0.0,
    colliders: tuple = (),
    tcol: jax.Array | None = None,
) -> jax.Array:
    """Single-chip fused P2G + fold + grid update (non-ext configs):
    fields -> the FINISHED, G2P-ready padded velocity grid
    (R0 + 4, R1 + 4, G2P_CH, G2), plane/row j = target row j - 1 on both
    axes (the g2p3d prepadded0+prepadded1 layout, zeros in the pads).

    Replaces the expanded (R0, 5, G1, nch, G2) intermediate (5x the grid
    footprint in HBM write + read), fold_rows0, the XLA grid update, AND
    g2p3d's zero-pad copy with in-VMEM accumulation: the TPU grid is
    sequential per core, so a 5-slot rolling scratch of (R1+4, nch, G2T)
    target-row planes carries partial sums between consecutive axis-0
    programs.  Program j (a) finalizes target row j - 2 — mass floor
    (ABSOLUTE, scene.mass_floor), gravity, slip/sticky bands or the
    diagonal penalty-EBC solve — and writes it to the output block once,
    (b) recycles that slot for incoming row j + 3, then (c) accumulates
    bucket row j's 25 target-pair contributions into the live slots.
    Grid = (n_tz, R0 + 5, R1/b1), tz OUTERMOST so the scratch rolls
    coherently (particle blocks are re-fetched n_tz times — at 256^3 that
    is ~2x the particle bytes vs ~5x the grid bytes saved).
    dimension_semantics pins all grid dims "arbitrary": megacore
    parallelization over axis 0 would break the rolling scratch.

    Sharded runs (halo exchange needs raw folded sums) and ext configs
    keep p2g3d + fold_rows0 + the XLA update."""
    r0, r1, k = fields[0].shape
    nch = P2G_CH_EXT if ext else P2G_CH
    if stress is not None:
        assert stress in ("linear", "tait") and not ext
        n_in = 18
    else:
        n_in = 3 + 3 + (9 if apic else 0) + 9 + 1 + (4 if ext else 0)
    assert len(fields) == n_in, (len(fields), n_in)
    assert g1 == r1, (g1, r1)  # buckets cover the (local) grid window
    kc = _chunk3d(k)
    b1 = _batch1(r1)
    p1 = r1 + NT - 1
    out_ch = nch if raw else (G2P_CH_EXT if ext else G2P_CH)
    # z tiling: the NT-slot scratch of (p1, nch, g2t) planes is the VMEM
    # driver (same budget role as p2g3d's output block).
    cap_mb = float(__import__("os").environ.get("MPM_P2G3D_BLOCK_MB", "6"))
    n_tz = 1
    while NT * p1 * nch * (g2 // n_tz) * 4 > cap_mb * 1024 * 1024:
        n_tz *= 2
    assert g2 % n_tz == 0, (g2, n_tz)
    g2t = g2 // n_tz
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(
            (1, b1, k),
            lambda tz, j, gq: (jnp.minimum(j, r0 - 1), gq, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(n_in)
    ]
    kin = tcol is not None
    inputs = (counts, *fields)
    if kin:
        # Kinematic colliders: simulation time rides as an SMEM scalar
        # appended AFTER the field refs (the kernel unpacks refs[-3]).
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs = (
            counts, *fields, jnp.reshape(tcol, (1,)).astype(jnp.float32)
        )
    return pl.pallas_call(
        functools.partial(
            _p2g3d_grid_kernel,
            r0=r0, r1=r1, b1=b1, g2t=g2t, dx=dx, kc=kc, apic=apic,
            stress=stress, kb=kb, mu=mu, gamma=gamma, fa=fa, tent=tent,
            ext=ext, raw=raw,
            dt=dt, grav=grav, floor=floor, lo=lo, hi=hi, wall=wall,
            beta=beta, colliders=colliders, kin=kin,
        ),
        grid=(n_tz, r0 + NT, r1 // b1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, p1, out_ch, g2t),
            lambda tz, j, gq: (jnp.maximum(j - 1, 0), 0, 0, tz),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (r0 + NT - 1, p1, out_ch, g2), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((NT, p1, nch, g2t), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*inputs)


def fold_rows0(expanded: jax.Array) -> jax.Array:
    """(R0, 5, G1, ch, G2) -> (G0, G1, ch, G2): 5 shifted accumulating
    updates (grid row g = sum_t expanded[g + 1 - t, t]).

    Deliberately the .at[].add formulation: an equivalent pad +
    shifted-slice + sum lowered INCORRECTLY on the TPU toolchain when
    fused into the substep program (nodes silently lost most of their
    summands — the kernel's expanded output was bit-exact while this
    fold's result had ~0.35x the mass; see docs/PERF.md postmortem)."""
    r, nt, g1, ch, g2 = expanded.shape
    buf = jnp.zeros((r + nt - 1, g1, ch, g2), expanded.dtype)
    for t in range(nt):
        buf = buf.at[t : t + r].add(expanded[:, t])
    return buf[1 : r + 1]


def fold_rows0_halo(expanded: jax.Array) -> jax.Array:
    """(L, 5, G1, ch, G2) -> (L + 4, G1, ch, G2): like fold_rows0 but
    UNcropped — row j of the result is axis-0 target row j - 1 relative to
    bucket row 0 (global rows [lo - 1, lo + L + 3) for a slab starting at
    lo).  The 3D slab-sharded fast path halo-exchanges the edge rows
    (parallel/fast_domain3d.py)."""
    r, nt, g1, ch, g2 = expanded.shape
    buf = jnp.zeros((r + nt - 1, g1, ch, g2), expanded.dtype)
    for t in range(nt):
        buf = buf.at[t : t + r].add(expanded[:, t])
    return buf


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------


def _g2p3d_kernel(
    counts_ref,
    *refs,
    r1: int,
    b1: int,
    g2: int,
    dx: float,
    dinv: float,
    kc: int,
    ext: bool,
    update: bool,
    alpha: float,
    dtv: float,
    tent: bool,
):
    # refs: gx0, gx1, gx2, mask, [v0, v1, v2, J, x0, x1, x2 if update],
    #       NT * (b1 + NT - 1) grid rows, out
    np_refs = 11 if update else 4
    grid_refs = refs[np_refs:-1]
    out_ref = refs[-1]
    i0 = pl.program_id(0)
    gq = pl.program_id(1)
    k = refs[0].shape[2]
    if update:
        nout = G2P_UPD
        # Dead-slot fill must keep J neutral (row 15 = 1): a zero J feeds
        # the Tait 1/J power with inf on the next substep.
        dead = jnp.concatenate(
            [jnp.zeros((15, kc), jnp.float32), jnp.ones((1, kc), jnp.float32)],
            axis=0,
        )
    else:
        nout = G2P_OUT_EXT if ext else G2P_OUT
        dead = jnp.zeros((nout, kc), jnp.float32)

    for b in range(b1):
        i1 = gq * b1 + b
        cnt = counts_ref[i0 * r1 + i1]
        rows = [grid_refs[t0 * (b1 + NT - 1) + b + t1] for t0 in range(NT) for t1 in range(NT)]
        for q in range(k // kc):
            @pl.when(q * kc >= cnt)
            def _(b=b, q=q):
                ds = pl.ds(q * kc, kc)
                out_ref[0, b, :, ds] = dead
                if update:
                    # Pass the input positions through (not zeros): the
                    # sharded caller adds x0_shift back to row 0, and the
                    # dead-slot invariant "(0 - a) + a == 0" only holds if
                    # dead slots round-trip their stored (shifted) value.
                    for a in range(3):
                        out_ref[0, b, a, ds] = refs[8 + a][0, b, ds]

            @pl.when(q * kc < cnt)
            def _(b=b, q=q, i1=i1, rows=rows):
                _g2p3d_chunk(
                    refs, rows, out_ref, i0, i1, b, q,
                    g2=g2, dx=dx, dinv=dinv, kc=kc,
                    ext=ext, update=update, alpha=alpha, dtv=dtv, tent=tent,
                )


def _g2p3d_chunk(
    refs, grid_rows, out_ref, i0, i1, b, q,
    *, g2, dx, dinv, kc, ext, update, alpha, dtv, tent,
):
    sl = slice(q * kc, (q + 1) * kc)
    # Precomputed grid coordinates — see _p2g3d_chunk's note on the
    # in-kernel FMA tap-set hazard.
    gx0 = refs[0][0, b, sl]
    gx1 = refs[1][0, b, sl]
    gx2 = refs[2][0, b, sl]
    mask = refs[3][0, b, sl]
    base0 = jnp.floor(gx0 - 0.5)
    base1 = jnp.floor(gx1 - 0.5)
    rel0 = base0 - i0.astype(jnp.float32)
    rel1 = base1 - i1
    valid = mask * (
        (rel0 >= -1.0) & (rel0 <= 1.0) & (rel1 >= -1.0) & (rel1 <= 1.0)
    ).astype(jnp.float32)
    w0 = _taps(gx0 - base0, tent)
    w1 = _taps(gx1 - base1, tent)

    # Transposed arithmetic column weights (G2, K): channels land on
    # sublanes after the dot; the signed distance is shared with W2.
    rows_io = jax.lax.broadcasted_iota(jnp.int32, (g2, kc), 0).astype(jnp.float32)
    dcol = rows_io - gx2[None, :]
    w_t = _col_weights(dcol, tent)
    w_t2 = w_t * (dcol * dx)

    gch = G2P_CH_EXT if ext else G2P_CH
    gs1 = []
    gs2 = []
    for pr in range(NT * NT):
        gt = grid_rows[pr][0, 0]  # (gch, G2)
        gs1.append(gt)
        gs2.append(gt[0:3])       # z-column term needed for v_new only (C)
    s1 = _dot(jnp.concatenate(gs1, axis=0), w_t)
    s2 = _dot(jnp.concatenate(gs2, axis=0), w_t2)

    wr0 = [_row_weights(rel0, w0, valid, t) for t in range(NT)]
    wr1 = [_row_weights(rel1, w1, jnp.ones_like(valid), t) for t in range(NT)]
    rdp0 = [(i0.astype(jnp.float32) + float(t - 1) - gx0) * dx for t in range(NT)]
    rdp1 = [(i1 + float(t - 1) - gx1) * dx for t in range(NT)]

    # Blockwise pair accumulation ((gch, K) FMAs instead of per-channel
    # (K,) ops — same restructure as transfer2d's G2P epilogue): sum1
    # carries the plain wr-weighted sums of every gather channel, sumA/B
    # the wr*rdp0 / wr*rdp1 weighted sums of the three v_new channels
    # (the two in-plane C terms), sumC the z-column (W2) term.
    n_extra = gch - G2P_CH
    sum1 = jnp.zeros((gch, kc), jnp.float32)
    sum_a = jnp.zeros((3, kc), jnp.float32)
    sum_b = jnp.zeros((3, kc), jnp.float32)
    sum_c = jnp.zeros((3, kc), jnp.float32)
    for t0 in range(NT):
        for t1 in range(NT):
            pr = t0 * NT + t1
            wr = wr0[t0] * wr1[t1]
            b1o = pr * gch
            b2o = pr * 3
            sv3 = s1[b1o : b1o + 3]
            sum1 = sum1 + wr[None, :] * s1[b1o : b1o + gch]
            sum_a = sum_a + (wr * rdp0[t0])[None, :] * sv3
            sum_b = sum_b + (wr * rdp1[t1])[None, :] * sv3
            sum_c = sum_c + wr[None, :] * s2[b2o : b2o + 3]
    vpic = [sum1[a] for a in range(3)]
    vold = [sum1[3 + a] for a in range(3)]
    extra = [sum1[6 + e] for e in range(n_extra)]
    c_out = []
    for a in range(3):
        c_out.append(dinv * sum_a[a])
        c_out.append(dinv * sum_b[a])
        c_out.append(dinv * sum_c[a])

    if update:
        # Fused particle update: FLIP blend, advection, and the volumetric
        # J update happen in-chunk so no slot-sized XLA pass runs outside.
        vprev = [refs[4 + a][0, b, sl] for a in range(3)]
        jprev = refs[7][0, b, sl]
        x_new = [refs[8 + a][0, b, sl] + dtv * vpic[a] * mask for a in range(3)]
        v_new = [
            (alpha * (vprev[a] + vpic[a] - vold[a]) + (1.0 - alpha) * vpic[a])
            * mask
            for a in range(3)
        ]
        div_new = c_out[0] + c_out[4] + c_out[8]
        j_new = jnp.where(mask > 0, jprev * (1.0 + dtv * div_new), 1.0)
        outs = x_new + v_new + c_out + [j_new]
    else:
        outs = vpic + vold + c_out + extra
    for ix, vals in enumerate(outs):
        out_ref[0, b, ix, sl] = vals


@functools.partial(
    jax.jit,
    static_argnames=(
        "dx", "dinv", "ext", "alpha", "dtv", "prepadded0", "prepadded1", "tent",
    ),
)
def g2p3d(
    gx0: jax.Array,
    gx1: jax.Array,
    gx2: jax.Array,
    mask: jax.Array,
    counts: jax.Array,
    grid: jax.Array,
    dx: float,
    dinv: float,
    ext: bool = False,
    state=None,
    alpha: float = 0.0,
    dtv: float = 0.0,
    prepadded0: bool = False,
    prepadded1: bool = False,
    tent: bool = False,
) -> jax.Array:
    """x/mask (R0, R1, K), grid (R0, R1, gch, G2) -> (R0, R1, nout, K).

    With `state` = (v0, v1, v2, J, x0, x1, x2) the kernel also runs the
    particle update in-chunk (FLIP blend alpha, advection by dtv on the
    RAW positions, J update) and returns [x (3), v (3), C (9), J] instead
    of the raw gathers.  gx are the PRECOMPUTED grid coordinates — see
    _p2g3d_chunk's note on the in-kernel FMA tap-set hazard."""
    r0, r1, k = gx0.shape
    update = state is not None
    gch = G2P_CH_EXT if ext else G2P_CH
    assert grid.shape[2] == gch, grid.shape
    g2 = grid.shape[3]
    nout = G2P_UPD if update else (G2P_OUT_EXT if ext else G2P_OUT)
    if prepadded1:
        # Axis-1 halo rows already present (2-axis slab shard buffer,
        # plane row j = target row j - 1) — axis 0 must be prepadded too.
        assert prepadded0 and grid.shape[:2] == (r0 + NT - 1, r1 + NT - 1), (
            grid.shape, r0, r1,
        )
        padded = grid
    elif prepadded0:
        # Axis 0 already carries the +-halo rows (slab shard buffer,
        # row j = target row j - 1); pad axis 1 only.
        assert grid.shape[0] == r0 + NT - 1, (grid.shape, r0)
        padded = jnp.zeros((r0 + NT - 1, r1 + NT - 1, gch, g2), grid.dtype)
        padded = padded.at[:, 1 : r1 + 1].set(grid)
    else:
        padded = jnp.zeros((r0 + NT - 1, r1 + NT - 1, gch, g2), grid.dtype)
        padded = padded.at[1 : r0 + 1, 1 : r1 + 1].set(grid)

    kc = _chunk3d(k)
    b1 = _batch1(r1)
    n_u = b1 + NT - 1
    grid_specs = [
        pl.BlockSpec(
            (1, 1, gch, g2),
            (lambda i, gq, t0=t0, u=u: (i + t0, gq * b1 + u, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        for t0 in range(NT)
        for u in range(n_u)
    ]
    n_part = 11 if update else 4
    part_specs = [
        pl.BlockSpec((1, b1, k), lambda i, gq: (i, gq, 0), memory_space=pltpu.VMEM)
        for _ in range(n_part)
    ]
    # counts as a plain SMEM operand — see p2g3d's prefetch-clobber note.
    return pl.pallas_call(
        functools.partial(
            _g2p3d_kernel,
            r1=r1, b1=b1, g2=g2,
            dx=dx, dinv=dinv, kc=kc, ext=ext,
            update=update, alpha=alpha, dtv=dtv, tent=tent,
        ),
        grid=(r0, r1 // b1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), *part_specs, *grid_specs],
        out_specs=pl.BlockSpec(
            (1, b1, nout, k), lambda i, gq: (i, gq, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r0, r1, nout, k), jnp.float32),
        interpret=_interpret(),
    )(
        counts, gx0, gx1, gx2, mask, *(state if update else ()),
        *([padded] * (NT * n_u)),
    )
