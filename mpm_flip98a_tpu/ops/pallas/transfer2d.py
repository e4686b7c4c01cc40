"""Fused 2D P2G / G2P Pallas TPU kernels over row-bucketed particles.

The reference's hot loops (cpp_validation/mls-mpm88-explained.cpp:53-102
P2G scatter, :133-179 G2P gather) re-designed as MXU work:

Particles are bucketed by stencil base row (ops/binning.py).  Each Pallas
program processes one grid row's bucket of K particle slots and expresses
the column-direction scatter/gather as a one-hot weight matrix product:

  P2G:  out[t, ch, :] = A[t, ch, :] @ W          (K-contraction on the MXU)
  G2P:  S[:, t, ch]   = W @ grid[t, ch, :]^T

where W[p, c] = column B-spline weight of particle p at grid column c —
built in VMEM from 3 vectorized compares per stencil tap, never
materialised in HBM.  The APIC/MLS affine term  Aff (x_node - x_p)  is
separable per axis, and the column part  (c - gx1) is rank-1, so it folds
into extra A rows (P2G) / extra `c * grid` channels (G2P) instead of a
second weight matrix:

  A2 @ (W * (c - gx1)) = (A2 @ W) * c - (A2 * gx1) @ W.

Row direction: a bucketed particle's base row is bucket_row + rel with
rel in {-1, 0, 1} (the rebucket margin), so its 3 stencil rows land in 5
candidate target rows t in {-1..3}; the kernel emits all 5 as an expanded
(R, 5, ch, G) output folded by 5 shifted adds in XLA (`fold_rows`) —
overlapping output blocks are not expressible in Pallas, and the fold is
bandwidth-trivial.  G2P reads the 5 overlapping grid rows through 5
row-block input refs of a padded grid.

Per-substep cost at N = 1M, G = 512, K = 4096: ~250 GFLOP of MXU work and
zero scatter ops — versus ~330 ms/substep for the XLA scatter path
(measured), a >20x headroom to the 1e9 transfer-ops/s target.

Channel conventions (flagship weakly-compressible FLIP98A fluid):
  P2G in  : pdata (R, 14, K) =
            [gx0, gx1, m v0, m v1, P00, P01, P10, P11,
             Q00, Q01, Q10, Q11, m, V]
            P = m C (APIC affine), Q = m C - dt Dinv tau (affine + force);
            every value row pre-masked (zeros in dead slots).
  P2G out : (R, 5, 6, G) -> fold_rows -> (G, 6, G) row-leading:
            [m v0, m v1, m v0 + f0, m v1 + f1, m, V]
            (single chip: p2g_grid instead fuses P2G + fold + grid
            update in ONE kernel and emits the padded G2P grid directly)
  G2P in  : pdata2 (R, 3, K) = [gx0, gx1, mask];
            grid (G, 4, G) = [v_new0, v_new1, v00, v01] (rows padded)
  G2P out : (R, 8, K) = [vpic0, vpic1, v0g0, v0g1, C00, C01, C10, C11]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 5  # candidate target rows: bucket_row - 1 .. bucket_row + 3
# Base channel sets; the extended variants add the fused-stabilization
# channels (nodal F-bar numerator/denominator + pressure/divergence
# projection), chosen by the input's channel count:
#   P2G plain channels: [m v (2), m v + f (2), m, V] / ext:
#                       [m v (2), m v + f (2), m, V0 J, V0, V0 p, V0 div]
#   G2P grid channels : [v_new (2), v0 (2)] / ext: + [Jbar, p, div]
# A-matrix rows per target row = plain channels + 4 column-linear + 4
# column-linear * gx1.
P2G_CH = 6
P2G_CH_EXT = 9
G2P_CH = 4
G2P_CH_EXT = 7


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# In-kernel matmul precision.  The MXU's DEFAULT precision runs fp32
# operands as ONE bf16 pass: measured 1.7e-3 partition-of-unity error on
# the one-hot weight products, which acts as a 0.4%-level per-transfer
# noise force and destabilized a 64^3 run within 300 substeps (TPU-only;
# interpret mode is exact fp32 and hid it).  Round 2 fixed this with
# Precision.HIGHEST (bf16x6), costing 21%/15% of the 2D/3D headline.
# Round 3 recovers most of that with a MANUAL bf16x3 split (Mosaic
# rejects Precision.HIGH): a = hi + lo with hi = bf16(a) and
# lo = fp32(a - hi) exactly representable, so
#   a @ b = ahi@bhi + alo@bhi + ahi@blo + O(2^-16)
# with each term a single-pass bf16 MXU dot accumulated in fp32.
# Measured max relative error ~4e-6 (validated: PoU probe 0 violations
# at 1e-5, fused-vs-general tap, 500-substep 64^3 multimaterial
# stability on real TPU — docs/PERF.md round-3 notes).
# MPM_DOT_MODE env: bf16x3 (default) | highest | default (A/B probes).
_DOT_MODE = __import__("os").environ.get("MPM_DOT_MODE", "bf16x3")


def _dot(a, b):
    """Full-precision kernel matmul (see precision note above)."""
    if _interpret() or _DOT_MODE == "highest":
        # Interpret mode (CPU tests) stays exact fp32.
        return jnp.dot(
            a, b,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # bf16x6 ~ full fp32
        )
    if _DOT_MODE == "default":  # known-wrong physics; probe only
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    # The two b_hi passes ride ONE M-stacked dot: every kernel call here
    # has M (= A rows) well under the 128-row MXU tile, so three separate
    # dots pay 3x the M-padding while [a_hi; a_lo] @ b_hi pays it once
    # (measured: -7% on the 2D substep at 1M/513^2).
    m = a.shape[0]
    o = d(jnp.concatenate([a_hi, a_lo], axis=0), b_hi)
    return (o[:m] + o[m:]) + d(a_hi, b_lo)


def _axis_weights(fx):
    """Quadratic B-spline taps (mls-mpm88-explained.cpp:60-64)."""
    return (
        0.5 * (1.5 - fx) ** 2,
        0.75 - (fx - 1.0) ** 2,
        0.5 * (fx - 0.5) ** 2,
    )


def _axis_weights_tent(fx):
    """Linear hat taps on the same 3-node stencil, fx in [0.5, 1.5)
    (ops/weights.tent; reference switch config.py:21)."""
    zero = jnp.zeros_like(fx)
    return (
        jnp.maximum(zero, 1.0 - fx),
        1.0 - jnp.abs(fx - 1.0),
        jnp.maximum(zero, fx - 1.0),
    )


def _taps(fx, tent: bool):
    return _axis_weights_tent(fx) if tent else _axis_weights(fx)


def _col_weights(d, tent: bool):
    """Column weight as an arithmetic function of the signed cell distance
    d = col - gx1 (no compare/selects): the quadratic B-spline is
    0.5 (1.5-|d|)+^2 - 1.5 (0.5-|d|)+^2 (identical piecewise values to
    `_axis_weights`, support exactly the 3 stencil columns), the tent is
    (1-|d|)+.  Replaces the 3x compare-select one-hot build — fewer (K, G)
    VPU ops, and algebraically the same weights both kernels consume."""
    a = jnp.abs(d)
    if tent:
        return jnp.maximum(1.0 - a, 0.0)
    t1 = jnp.maximum(1.5 - a, 0.0)
    t2 = jnp.maximum(0.5 - a, 0.0)
    return 0.5 * t1 * t1 - 1.5 * t2 * t2


def _row_weights(rel, w0, valid, t):
    """Weight this bucket's particles put on target row offset t-1:
    sum_j [rel + j == t - 1] w0_j, zeroed for out-of-margin slots."""
    wr = jnp.zeros_like(rel)
    for j in range(3):
        wr = wr + jnp.where(rel == float(t - 1 - j), w0[j], 0.0)
    return wr * valid


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------


def _p2g_kernel(counts_ref, pdata_ref, out_ref, *, g: int, dx: float, kc: int, ext: bool, tent: bool, apic: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    # K-chunk accumulation: the output block is revisited for every chunk
    # of the slot axis (grid dim 1); zero it on the first visit.
    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Buckets are packed (actives first), so a chunk past the row's count
    # holds only dead slots — skip its entire body.  Empty grid rows and
    # sparse buckets then cost one predicate each.
    def emit(t, upd):
        out_ref[0, t] += upd

    @pl.when(j * kc < counts_ref[i])
    def _body():
        _p2g_chunk(pdata_ref, emit, i, g=g, dx=dx, ext=ext, tent=tent, apic=apic)


def _p2g_chunk(pdata_ref, emit, i, *, g: int, dx: float, ext: bool, tent: bool, apic: bool):
    pd = pdata_ref[0]  # (14, KC)
    mv = (pd[2], pd[3])
    p_aff = (pd[4], pd[5], pd[6], pd[7])   # P00 P01 P10 P11
    q_aff = (pd[8], pd[9], pd[10], pd[11])
    nch = P2G_CH_EXT if ext else P2G_CH
    plain = [pd[12 + e] for e in range(nch - 4)]  # m, V[, V0 J, V0, V0 p, V0 div]
    _p2g_core(
        emit, i, pd[0], pd[1], mv, p_aff, q_aff, plain,
        g=g, dx=dx, tent=tent, apic=apic,
    )


def _p2g_core(
    emit, i, gx0, gx1, mv, p_aff, q_aff, plain,
    *, g: int, dx: float, tent: bool, apic: bool,
):
    """Shared P2G chunk body: one-hot column matmul + 5-target-row
    expansion, for channels [mv (2), mv + f (2), *plain]."""
    k = gx0.shape[0]
    nch = 4 + len(plain)

    base0 = jnp.floor(gx0 - 0.5)
    rel = base0 - i.astype(jnp.float32)
    valid = ((rel >= -1.0) & (rel <= 1.0)).astype(jnp.float32)
    fx0 = gx0 - base0
    w0 = _taps(fx0, tent)

    # Column weight matrix (K, G), arithmetic build — see _col_weights.
    # The column-affine term keeps the rank-1 fold
    # (A2 @ (W (c - gx1)) = (A2 @ W) c - (A2 gx1) @ W): one big matmul
    # amortises better than a second small W2 product at 2D's G = 512
    # widths (measured: a W2 variant lost 10% end-to-end).  PIC configs
    # skip the P-affine rows entirely (they are zero).
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, g), 1).astype(jnp.float32)
    w_mat = _col_weights(cols - gx1[:, None], tent)

    na2 = 4 if apic else 2  # column-linear rows: (P01, P11,) Q01, Q11
    arows = nch + 2 * na2
    aoff = 0 if apic else 2  # first momentum row carrying an rdp term

    # A is built blockwise: U (arows, K) is the rdp-independent factor,
    # Vaff (na2, K) the rdp coefficient of the affine momentum rows —
    # A_t = wr_t * U with wr_t * rdp_t * Vaff added on rows
    # [aoff, aoff + na2).  Two fused (rows, K) ops per target row instead
    # of ~arows separate (K,) row builds + a 45-way stack (the per-row
    # version dominated the kernel's VPU time — docs/PERF.md round-3).
    if apic:
        vaff = jnp.stack([p_aff[0], p_aff[2], q_aff[0], q_aff[2]])
        a2 = jnp.stack([p_aff[1], p_aff[3], q_aff[1], q_aff[3]]) * dx
    else:
        vaff = jnp.stack([q_aff[0], q_aff[2]])
        a2 = jnp.stack([q_aff[1], q_aff[3]]) * dx
    u = jnp.concatenate(
        [jnp.stack([mv[0], mv[1], mv[0], mv[1]] + list(plain)), a2, a2 * gx1[None, :]]
    )  # (arows, K)

    blocks = []
    for t in range(NT):
        wr = _row_weights(rel, w0, valid, t)
        rdp = (i.astype(jnp.float32) + float(t - 1) - gx0) * dx
        at = wr[None, :] * u
        at_aff = at[aoff : aoff + na2] + (wr * rdp)[None, :] * vaff
        parts = [at[:aoff], at_aff, at[aoff + na2 :]]
        blocks.append(jnp.concatenate([p for p in parts if p.shape[0]], axis=0))
    a_mat = jnp.concatenate(blocks, axis=0)  # (NT * arows, K)
    o = _dot(a_mat, w_mat)

    # Vectorized epilogue: fold the rank-1 column-affine correction rows
    # into the momentum channels blockwise and accumulate one (nch, G)
    # slab per target row — (1, G) row ops use 1/8 of the VPU sublanes.
    colv = cols[0:1, :]  # (1, G) column index as f32
    for t in range(NT):
        b = t * arows
        main = o[b : b + nch]
        lin = o[b + nch : b + nch + na2]
        lingx = o[b + nch + na2 : b + arows]
        corr = lin * colv - lingx
        parts = [main[:aoff], main[aoff : aoff + na2] + corr, main[aoff + na2 :]]
        upd = jnp.concatenate([p for p in parts if p.shape[0]], axis=0)
        emit(t, upd)


def _chunk(k: int) -> int:
    """Slot-axis chunk: caps the in-VMEM weight matrix at ~2048 x G, so
    the packed-count skip can trim partially-filled buckets at finer
    granularity.  K must divide evenly (FastSpec guarantees it).

    MPM_KC2D overrides the cap for on-chip A/B probes.  Default picked
    from bench-harness data at 1M/513² on v5e-1 (2026-08-19,
    docs/measurements/r5_campaign.log + r5_mega.log): under the
    while-loop run() 2048 measured 5.578 ms/substep (3.227e9) vs 5.855
    (3.074e9) at 1024; 4096 craters to 8.715 ms (2.065e9, VMEM spill)
    and 512 to 7.048 ms — 2048 amortises the per-chunk fixed cost /
    W-build best while the weight matrix still fits VMEM."""
    cap = int(__import__("os").environ.get("MPM_KC2D", "2048"))
    nc = -(-k // cap)
    # Chunks must divide K evenly AND stay lane-divisible (Mosaic
    # requires block dims % 128; k = 2688 with cap 2048 would give
    # 1344 — caught on chip 2026-08-19).  k is a multiple of 128, so
    # nc = k // 128 always terminates the search.
    while k % nc or (k // nc) % 128:
        nc += 1
    return k // nc


@functools.partial(jax.jit, static_argnames=("g", "dx", "tent", "apic"))
def p2g(
    pdata: jax.Array, counts: jax.Array, g: int, dx: float, tent: bool = False,
    apic: bool = True,
) -> jax.Array:
    """pdata (R, 8 + nch, K), counts (R,) int32 -> (R, 5, nch, G).

    nch is inferred from pdata's field count: 14 rows = base channels,
    17 rows = extended (fused F-bar / projection) channels."""
    r, f, k = pdata.shape
    nch = f - 8
    assert nch in (P2G_CH, P2G_CH_EXT), f
    ext = nch == P2G_CH_EXT
    kc = _chunk(k)
    # counts rides as a PLAIN SMEM operand, NOT scalar prefetch: two
    # PrefetchScalarGridSpec kernels in one XLA program clobbered each
    # other's prefetched scalars on the TPU toolchain (bit-stable missing
    # chunk-skips => whole grid rows of mass lost; docs/PERF.md
    # postmortem #3).  No index map reads the scalars, so prefetch was
    # unnecessary anyway.  Same treatment in g2p and transfer3d.
    return pl.pallas_call(
        functools.partial(_p2g_kernel, g=g, dx=dx, kc=kc, ext=ext, tent=tent, apic=apic),
        grid=(r, k // kc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f, kc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NT, nch, g), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, NT, nch, g), jnp.float32),
        interpret=_interpret(),
    )(counts, pdata)


P2G_CH_FUSED = 5  # [m v0, m v1, m v0 + f0, m v1 + f1, m] — V is unused
                  # by the non-ext grid update, so the fused path drops it.


def _p2g_fused_kernel(
    counts_ref, *refs,
    g: int, dx: float, kc: int, tent: bool, apic: bool,
    eos: str, kb: float, mu: float, gamma: float, fa: float,
):
    out_ref = refs[-1]
    in_refs = refs[:-1]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def emit(t, upd):
        out_ref[0, t] += upd

    @pl.when(j * kc < counts_ref[i])
    def _body():
        _p2g_fused_chunk(
            in_refs[0], emit, i, g=g, dx=dx, tent=tent, apic=apic,
            eos=eos, kb=kb, mu=mu, gamma=gamma, fa=fa,
        )


def _p2g_fused_chunk(
    sdata_ref, emit, i,
    *, g, dx, tent, apic, eos, kb, mu, gamma, fa,
):
    # Fused fluid stress (fast2d's weakly-compressible tau) computed
    # in-chunk from the raw state — only ACTIVE chunks pay, where a
    # slot-shaped XLA prep pass pays for every dead slot (same design
    # as transfer3d's stress mode).  Dead slots are neutral
    # (mass = vol0 = 0, J = 1): they contribute exact zeros unmasked.
    sd = sdata_ref[0]  # (11, KC)
    ld = lambda ix: sd[ix]
    gx0, gx1 = ld(0), ld(1)
    v0, v1 = ld(2), ld(3)
    c00, c01, c10, c11 = ld(4), ld(5), ld(6), ld(7)
    jj, mass, vol0 = ld(8), ld(9), ld(10)
    mv = (mass * v0, mass * v1)
    if eos == "linear":
        pressure = -kb * (jj - 1.0)
    else:  # tait
        j_safe = jnp.maximum(jj, jnp.float32(1e-3))
        pressure = (kb / gamma) * ((1.0 / j_safe) ** gamma - 1.0)
    div = c00 + c11
    vj = vol0 * jj
    t00 = vj * (-pressure + 2.0 * mu * (c00 - 0.5 * div))
    t11 = vj * (-pressure + 2.0 * mu * (c11 - 0.5 * div))
    t01 = vj * (2.0 * mu * 0.5 * (c01 + c10))
    if apic:
        p_aff = (mass * c00, mass * c01, mass * c10, mass * c11)
        q_aff = (
            p_aff[0] + fa * t00, p_aff[1] + fa * t01,
            p_aff[2] + fa * t01, p_aff[3] + fa * t11,
        )
    else:
        p_aff = None
        q_aff = (fa * t00, fa * t01, fa * t01, fa * t11)
    _p2g_core(
        emit, i, gx0, gx1, mv, p_aff, q_aff, [mass],
        g=g, dx=dx, tent=tent, apic=apic,
    )


@functools.partial(
    jax.jit,
    static_argnames=("g", "dx", "tent", "apic", "eos", "kb", "mu", "gamma", "fa"),
)
def p2g_fused(
    sdata: jax.Array,
    counts: jax.Array,
    g: int,
    dx: float,
    tent: bool,
    apic: bool,
    eos: str,
    kb: float,
    mu: float,
    gamma: float,
    fa: float,
) -> jax.Array:
    """Fused-stress P2G for the single-fluid flagship config.

    sdata (R, 11, K): raw state rows [gx0, gx1, v0, v1, C00, C01, C10,
    C11, J, mass, vol0] — a pure copy, no slot-sized stress prep pass.
    Returns (R, 5, 5, G)."""
    r, f, k = sdata.shape
    assert f == 11, sdata.shape
    kc = _chunk(k)
    return pl.pallas_call(
        functools.partial(
            _p2g_fused_kernel,
            g=g, dx=dx, kc=kc, tent=tent, apic=apic,
            eos=eos, kb=kb, mu=mu, gamma=gamma, fa=fa,
        ),
        grid=(r, k // kc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, f, kc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NT, P2G_CH_FUSED, g),
            lambda i, j: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (r, NT, P2G_CH_FUSED, g), jnp.float32
        ),
        interpret=_interpret(),
    )(counts, sdata)


def _p2g_grid_kernel(
    counts_ref, data_ref, *refs,
    r: int, g: int, nch: int, kc: int, dx: float, fused: bool,
    ext: bool, raw: bool, tent: bool, apic: bool, eos: str, kb: float,
    mu: float,
    gamma: float, fa: float, dt: float, gx_: float, gy_: float, floor: float, lo: int,
    hi: int, wall: str, beta: float, colliders: tuple = (), kin: bool = False,
):
    """Rolling-scratch P2G + fold [+ grid update] — see p2g_grid."""
    if kin:
        t_ref, out_ref, scratch = refs
    else:
        t_ref = None
        out_ref, scratch = refs
    jrow = pl.program_id(0)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _emit_and_roll():
        # Program j finalizes target row j - 2 (contributors: buckets
        # j-3..j-1, all in earlier programs) and recycles its slot for
        # incoming target row j + 3 (slot(j-2) == slot(j+3) mod 5).
        @pl.when(jrow == 0)
        def _():
            scratch[...] = jnp.zeros_like(scratch)

        s = jax.lax.rem(jrow + 3, jnp.int32(NT))
        plane = scratch[pl.ds(s, 1)][0]          # (nch, G) folded sums
        if raw:
            # Halo layout: raw UNcropped folded sums (slab-shard edge
            # partial sums ride the exchange; == fold_rows_halo(p2g)).
            out_ref[0] = plane
            scratch[pl.ds(s, 1)] = jnp.zeros_like(scratch[pl.ds(s, 1)])
            return
        t0r = jrow - 2
        m = plane[4]
        # Crop targets outside [0, r) — top-boundary scatter rows must
        # emit zeros, exactly like fold_rows' [1, r+1) crop.
        interior = jnp.logical_and(t0r >= 0, t0r < r)
        has = jnp.logical_and(m > floor, interior)
        safe = jnp.where(has, m, 1.0)
        v0x = jnp.where(has, plane[0] / safe, 0.0)
        v0y = jnp.where(has, plane[1] / safe, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1)[0]
        low1, high1 = col <= lo, col >= hi       # (G,) column wall bands
        jlow, jhigh = t0r <= lo, t0r >= hi       # scalar row wall bands
        if wall == "penalty":
            # (m I + dt beta n(x)n) v = m v* + dt m g — diagonal solve.
            pen0 = jnp.where(jnp.logical_or(jlow, jhigh), 1.0, 0.0)
            pen1 = jnp.logical_or(low1, high1).astype(jnp.float32)
            vx = jnp.where(
                has, (plane[2] + (dt * gx_) * m) / (m + (dt * beta) * pen0), 0.0
            )
            vy = jnp.where(
                has, (plane[3] + (dt * gy_) * m) / (m + (dt * beta) * pen1), 0.0
            )
        else:
            hasf = has.astype(jnp.float32)
            vx = jnp.where(has, plane[2] / safe, 0.0) + (dt * gx_) * hasf
            vy = jnp.where(has, plane[3] / safe, 0.0) + (dt * gy_) * hasf
            if wall == "sticky":
                anyband = jnp.logical_or(
                    jnp.logical_or(low1, high1), jnp.logical_or(jlow, jhigh)
                )
                vx = jnp.where(anyband, 0.0, vx)
                vy = jnp.where(anyband, 0.0, vy)
            else:  # slip: clamp the outgoing normal component per band
                vx = jnp.where(jlow, jnp.maximum(vx, 0.0), vx)
                vx = jnp.where(jhigh, jnp.minimum(vx, 0.0), vx)
                vy = jnp.where(low1, jnp.maximum(vy, 0.0), vy)
                vy = jnp.where(high1, jnp.minimum(vy, 0.0), vy)
        if colliders:
            # EXTENSION (docs/ROADMAP.md lever 11): rigid SDF collider BC
            # in-kernel, so collider scenes keep the fused rolling-scratch
            # pipeline instead of standing the in-kernel grid update down.
            # models/colliders.project is pure elementwise jnp, so it
            # traces into Mosaic directly on the (G,) target-row planes;
            # same placement (after the wall/penalty BC) and same float
            # arithmetic as the XLA path (fast2d._grid_update2d), with the
            # scalar row coordinate broadcasting against the lane columns.
            # `lo` == PAD for every caller, so node x = (idx - lo) * dx
            # matches colliders.node_coords.  `kin` feeds simulation time
            # for kinematic geometry via the SMEM scalar operand.
            from mpm_flip98a_tpu.models import colliders as _col

            tcol = t_ref[0] if kin else None
            coords = [
                (t0r.astype(jnp.float32) - lo) * dx,
                (col.astype(jnp.float32) - lo) * dx,
            ]
            vx, vy = _col.project([vx, vy], coords, colliders, tcol)
            # Pad-row contract: non-interior target rows must emit exact
            # zeros (g2p prepadded layout), but project() writes vsurf on
            # every inside node — re-crop.
            vx = jnp.where(interior, vx, 0.0)
            vy = jnp.where(interior, vy, 0.0)
        rows = [vx, vy, v0x, v0y]
        if ext:
            v0sum = plane[6]
            has_v = jnp.logical_and(v0sum > 0, interior)
            safe_v = jnp.where(has_v, v0sum, 1.0)
            # Jbar's empty-node default (1.0) applies to INTERIOR rows
            # only — pad rows stay exact zeros like every other channel.
            jbar_dflt = jnp.where(interior, 1.0, 0.0)
            rows.append(jnp.where(has_v, plane[5] / safe_v, jbar_dflt))
            rows.append(jnp.where(has_v, plane[7] / safe_v, 0.0))
            rows.append(jnp.where(has_v, plane[8] / safe_v, 0.0))
        for ix, v in enumerate(rows):
            out_ref[0, ix] = v
        scratch[pl.ds(s, 1)] = jnp.zeros_like(scratch[pl.ds(s, 1)])

    def emit(t, upd):
        s = jax.lax.rem(jrow + t + jnp.int32(4), jnp.int32(NT))
        scratch[pl.ds(s, 1)] += upd[None]

    @pl.when(
        jnp.logical_and(
            jrow < r, q * kc < counts_ref[jnp.minimum(jrow, r - 1)]
        )
    )
    def _body():
        if fused:
            _p2g_fused_chunk(
                data_ref, emit, jrow, g=g, dx=dx, tent=tent, apic=apic,
                eos=eos, kb=kb, mu=mu, gamma=gamma, fa=fa,
            )
        else:
            _p2g_chunk(
                data_ref, emit, jrow, g=g, dx=dx, ext=ext, tent=tent,
                apic=apic,
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "dx", "fused", "raw", "tent", "apic", "eos", "kb", "mu",
        "gamma", "fa", "dt", "gx_", "gy_", "floor", "lo", "hi", "wall",
        "beta", "colliders",
    ),
)
def p2g_grid(
    data: jax.Array,
    counts: jax.Array,
    g: int,
    dx: float,
    *,
    fused: bool,
    tent: bool,
    apic: bool,
    raw: bool = False,
    eos: str = "tait",
    kb: float = 0.0,
    mu: float = 0.0,
    gamma: float = 7.0,
    fa: float = 0.0,
    dt: float = 0.0,
    gx_: float = 0.0,
    gy_: float = 0.0,
    floor: float = 0.0,
    lo: int = 0,
    hi: int = 0,
    wall: str = "slip",
    beta: float = 0.0,
    colliders: tuple = (),
    tcol: jax.Array | None = None,
) -> jax.Array:
    """Single-chip fused P2G + fold + grid update (2D): data -> the
    FINISHED, g2p-ready PADDED grid (R + 4, gch, G), row j = target row
    j - 1, zeros in the pads (feed g2p with prepadded=True).

    Same rolling-scratch design as transfer3d.p2g3d_grid: the TPU grid
    is sequential per core, so an NT-slot scratch of (nch, G) target
    rows carries fold partial sums between consecutive row programs —
    the expanded (R, 5, nch, G) intermediate, the fold pass, the XLA
    grid update pass, and g2p's zero-pad copy all disappear.  Program j finalizes target row j - 2 (mass floor,
    gravity, slip/sticky bands or diagonal penalty solve, ext nodal
    averages), writes it once, recycles the slot for row j + 3.
    dimension_semantics pins both grid dims "arbitrary" (a parallel
    axis-0 would break the roll).

    `data`: sdata (R, 11, K) when fused=True (raw state, in-kernel
    stress) else prepped pdata (R, 8 + nch, K).  `floor` is the ABSOLUTE
    grid-mass floor (Scene.mass_floor; required — the relative fallback
    needs a global max).  Sharded / grid-reduced runs keep p2g +
    fold_rows_halo: the halo exchange must see raw folded sums."""
    r, f, k = data.shape
    if fused:
        assert f == 11, data.shape
        nch, ext = P2G_CH_FUSED, False
    else:
        nch = f - 8
        assert nch in (P2G_CH, P2G_CH_EXT), f
        ext = nch == P2G_CH_EXT
    gch = nch if raw else (G2P_CH_EXT if ext else G2P_CH)
    kc = _chunk(k)
    kin = tcol is not None
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, f, kc),
            lambda i, j: (jnp.minimum(i, r - 1), 0, j),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = (counts, data)
    if kin:
        # Kinematic colliders: simulation time rides as an SMEM scalar.
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs = (counts, data, jnp.reshape(tcol, (1,)).astype(jnp.float32))
    return pl.pallas_call(
        functools.partial(
            _p2g_grid_kernel,
            r=r, g=g, nch=nch, kc=kc, dx=dx, fused=fused, ext=ext,
            raw=raw,
            tent=tent, apic=apic, eos=eos, kb=kb, mu=mu, gamma=gamma, fa=fa, dt=dt,
            gx_=gx_, gy_=gy_, floor=floor, lo=lo, hi=hi, wall=wall,
            beta=beta, colliders=colliders, kin=kin,
        ),
        grid=(r + NT, k // kc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, gch, g),
            lambda i, j: (jnp.maximum(i - 1, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((r + NT - 1, gch, g), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NT, nch, g), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*inputs)


def fold_rows(expanded: jax.Array) -> jax.Array:
    """(R, 5, ch, G) -> (G, ch, G): grid[row, ch] = sum_t expanded[row+1-t, t].

    ROW-LEADING output: the grid update (fast2d._grid_update2d) and the
    G2P input grid both use (rows, ch, G), so the whole substep tail runs
    transpose-free (the former channel-leading layout paid two ~6 MB
    relayouts per substep at G = 513)."""
    r, nt, ch, g = expanded.shape
    buf = jnp.zeros((r + nt - 1, ch, g), expanded.dtype)
    for t in range(nt):
        buf = buf.at[t : t + r].add(expanded[:, t])
    return buf[1 : r + 1]


def fold_rows_halo(expanded: jax.Array) -> jax.Array:
    """(R, 5, ch, G) -> (R + 4, ch, G): like fold_rows but UNcropped.

    Row j of the result is target row j - 1 relative to bucket row 0 —
    i.e. global rows [lo - 1, lo + R + 3) for a slab whose first bucket
    row is lo.  The slab-sharded fast path (parallel/fast_domain.py)
    halo-exchanges these edge rows instead of cropping them."""
    r, nt, ch, g = expanded.shape
    buf = jnp.zeros((r + nt - 1, ch, g), expanded.dtype)
    for t in range(nt):
        buf = buf.at[t : t + r].add(expanded[:, t])
    return buf


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------


def _g2p_kernel(
    counts_ref, pdata_ref, *rest,
    g: int, dx: float, dinv: float, kc: int, ext: bool, tent: bool,
    update: bool, alpha: float, dtv: float,
):
    # In update mode pdata carries 5 extra state rows [v0, v1, J, x0, x1]
    # after [gx0, gx1, mask].
    out_ref = rest[NT]
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Skipped chunks (past the row's packed count) must still define their
    # output block — zero it; the substep masks dead slots anyway.  In
    # update mode, positions pass through (dead slots must round-trip
    # their stored value) and J stays neutral at 1.
    @pl.when(j * kc >= counts_ref[i])
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        if update:
            out_ref[0, 0, :] = pdata_ref[0, 6]  # x0
            out_ref[0, 1, :] = pdata_ref[0, 7]  # x1
            out_ref[0, 8, :] = jnp.ones((kc,), jnp.float32)  # J

    @pl.when(j * kc < counts_ref[i])
    def _body():
        _g2p_chunk(
            pdata_ref, rest, i, g=g, dx=dx, dinv=dinv, ext=ext, tent=tent,
            update=update, alpha=alpha, dtv=dtv,
        )


def _g2p_chunk(
    pdata_ref, rest, i, *, g: int, dx: float, dinv: float, ext: bool,
    tent: bool, update: bool, alpha: float, dtv: float,
):
    grid_refs = rest[:NT]
    out_ref = rest[NT]
    pd = pdata_ref[0]  # (3, K)
    k = pd.shape[1]
    gx0, gx1, mask = pd[0], pd[1], pd[2]

    base0 = jnp.floor(gx0 - 0.5)
    rel = base0 - i.astype(jnp.float32)
    valid = mask * ((rel >= -1.0) & (rel <= 1.0)).astype(jnp.float32)
    fx0 = gx0 - base0
    w0 = _taps(fx0, tent)

    # Transposed column weights (G, K), arithmetic build (_col_weights):
    # grid columns on sublanes, particle slots on lanes — the result S then
    # has channels on sublanes, so every extract below is a cheap row slice
    # (lane slicing would force relayouts; measured 10x slower).
    rows_io = jax.lax.broadcasted_iota(jnp.int32, (g, k), 0).astype(jnp.float32)
    w_t = _col_weights(rows_io - gx1[None, :], tent)

    # Grid rows for the 5 candidate targets, channels-leading: each
    # (gch, G); only the v_new rows need the column-weighted variant
    # (the C column term) — gch + 2 gather rows per target, not 2 gch.
    gch = G2P_CH_EXT if ext else G2P_CH
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, g), 1).astype(jnp.float32)
    gs = []
    for t in range(NT):
        gt = grid_refs[t][0]            # (gch, G)
        gs.append(gt)
        gs.append(gt[0:2] * colv)
    gboth = jnp.concatenate(gs, axis=0)  # (5 * (gch + 2), G)

    s = _dot(gboth, w_t)

    # Blockwise target-row accumulation ((nb, K) FMAs instead of ~80
    # single-sublane row ops — docs/PERF.md round-3).  sum1 carries the
    # plain wr-weighted sums of every gather channel; sum2 the wr*rdp
    # sums of the two v_new channels (the C row term).  The C column term
    # factors out of the t-sum: sum_t wr (svc - gx1 sv) = sum1[gch + a]
    # - gx1 * sum1[a].
    nb = gch + 2
    sum1 = jnp.zeros((nb, k), jnp.float32)
    sum2 = jnp.zeros((2, k), jnp.float32)
    for t in range(NT):
        wr = _row_weights(rel, w0, valid, t)
        rdp = (i.astype(jnp.float32) + float(t - 1) - gx0) * dx
        b = nb * t
        sum1 = sum1 + wr[None, :] * s[b : b + nb]
        sum2 = sum2 + (wr * rdp)[None, :] * s[b : b + 2]
    vpic = [sum1[0], sum1[1]]
    vold = [sum1[2], sum1[3]]
    n_extra = gch - G2P_CH
    extra = [sum1[4 + e] for e in range(n_extra)]
    c_out = []
    for a in range(2):
        c_out.append(dinv * sum2[a])
        c_out.append(dinv * dx * (sum1[gch + a] - gx1 * sum1[a]))

    if update:
        # Fused particle update (FLIP blend, advection, J) — no
        # slot-sized XLA tail pass (same design as transfer3d's update
        # mode).  vpic is already masked (wr carries `valid`), so dead
        # slots pass their position through and keep v = 0, J = 1.
        vprev = (pd[3], pd[4])
        jprev = pd[5]
        xprev = (pd[6], pd[7])
        x_new = [xprev[a] + dtv * vpic[a] for a in range(2)]
        v_new = [
            (alpha * (vprev[a] + vpic[a] - vold[a]) + (1.0 - alpha) * vpic[a])
            * mask
            for a in range(2)
        ]
        div_new = c_out[0] + c_out[3]
        j_new = jnp.where(mask > 0, jprev * (1.0 + dtv * div_new), 1.0)
        outs = x_new + v_new + c_out + [j_new]
    else:
        outs = vpic + vold + c_out + extra
    for ix, vals in enumerate(outs):
        out_ref[0, ix, :] = vals


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dinv", "tent", "prepadded", "update", "alpha", "dtv"),
)
def g2p(
    pdata2: jax.Array,
    counts: jax.Array,
    grid4: jax.Array,
    dx: float,
    dinv: float,
    tent: bool = False,
    prepadded: bool = False,
    update: bool = False,
    alpha: float = 0.0,
    dtv: float = 0.0,
) -> jax.Array:
    """pdata2 (R, 3, K), counts (R,) int32, grid4 (R, gch, G)
    channels-leading -> (R, 8 or 11, K).

    gch = 4 (base: v_new, v0) or 7 (extended: + Jbar, p, div — the fused
    stabilization read-back).  grid4 rows are the UNPADDED grid; padding to
    (R+4, gch, G) happens here so the 5 overlapping row windows exist.
    With prepadded=True, grid4 is ALREADY the (R+4, gch, G) halo buffer
    (row j = bucket-relative target row j - 1) — the slab-sharded fast
    path passes its halo-synced buffer directly."""
    r, npd, k = pdata2.shape
    gch = grid4.shape[1]
    assert gch in (G2P_CH, G2P_CH_EXT), grid4.shape
    ext = gch == G2P_CH_EXT
    if update:
        # Fused particle update: pdata2 carries the state rows
        # [gx0, gx1, mask, v0, v1, J, x0, x1]; output rows become
        # [x0, x1, v0, v1, C00..C11, J].
        assert not ext and npd == 8, pdata2.shape
        n_out = 9
    else:
        assert npd == 3, pdata2.shape
        n_out = 8 + (gch - G2P_CH)
    g = grid4.shape[2]
    kc = _chunk(k)
    if prepadded:
        assert grid4.shape[0] == r + NT - 1, (grid4.shape, r)
        padded = grid4
    else:
        padded = jnp.zeros((r + NT - 1, gch, g), grid4.dtype)
        padded = padded.at[1 : r + 1].set(grid4)

    grid_specs = [
        pl.BlockSpec(
            (1, gch, g), (lambda i, j, t=t: (i + t, 0, 0)), memory_space=pltpu.VMEM
        )
        for t in range(NT)
    ]
    # counts as a plain SMEM operand — see p2g's prefetch-clobber note.
    return pl.pallas_call(
        functools.partial(
            _g2p_kernel, g=g, dx=dx, dinv=dinv, kc=kc, ext=ext, tent=tent,
            update=update, alpha=alpha, dtv=dtv,
        ),
        grid=(r, k // kc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, npd, kc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            *grid_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, n_out, kc), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, n_out, k), jnp.float32),
        interpret=_interpret(),
    )(counts, pdata2, *([padded] * NT))
