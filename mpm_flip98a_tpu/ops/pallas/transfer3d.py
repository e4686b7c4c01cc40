"""Fused 3D P2G / G2P Pallas TPU kernels over pencil-bucketed particles.

3D extension of the 2D row-bucket design (transfer2d.py): particles are
bucketed by their (base row0, base row1) pencil — one bucket per (x, y)
grid line, K slots each — and each Pallas program turns the axis-2 (z)
scatter/gather of one pencil into one-hot weight-matrix products on the
MXU.  Axis 0 and axis 1 use the +-1-bucket drift margin, so a particle's
3x3 stencil rows land in 5x5 candidate target pencils.

P2G output strategy: programs iterate (i0, i1) with i1 fastest; the output
block is the full (5 t0-targets, CH, G1, G2) plane for row i0, revisited
and accumulated in VMEM across all i1 (zeroed at i1 == 0), with each
(t0, t1) contribution added at dynamic row i1 + t1 - 1.  Only the axis-0
expansion (5x) survives to HBM and is folded by shifted adds
(`fold_rows0`).  G2P reads the 5x5 overlapping grid pencils through 25
row-block input refs of a padded grid.

Channel conventions (weakly-compressible FLIP98A fluid, 3D):
  P2G in  : pdata (R0, R1, 26, K) =
            [gx0, gx1, gx2, mv0, mv1, mv2,
             P00..P22 (9), Q00..Q22 (9), m, V]
  P2G out : (R0, 5, 8, G1, G2) -> fold_rows0 -> (8, G0, G1, G2):
            [m v (3 pure), m v + f (3 forced), m, V]
  G2P in  : pdata2 (R0, R1, 4, K) = [gx0, gx1, gx2, mask];
            grid (R0, R1, 4, G2) = [v_new (3), v0... see fast3d] padded
  G2P out : (R0, R1, 18, K) = [vpic (3), v0g (3), C (9), pad (3)]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpm_flip98a_tpu.ops.pallas.transfer2d import _axis_weights, _interpret, _row_weights

NT = 5
P2G_CH = 8            # mv_pure(3), mv_forced(3), m, V
P2G_AROWS = 20        # 8 plain + 6 col-linear + 6 col-linear * gx2
G2P_CH = 6            # v_new(3), v0(3)
G2P_OUT = 18          # vpic(3), v0g(3), C(9), pad to even


def _onehot_w(base2, w2, k, g2, col0=0):
    """One-hot column weights for columns [col0, col0 + g2)."""
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (k, g2), 1).astype(jnp.float32)
    w_mat = jnp.zeros((k, g2), jnp.float32)
    for c in range(3):
        w_mat = w_mat + jnp.where(cols == base2[:, None] + c, w2[c][:, None], 0.0)
    return w_mat


def _geom(pd, i0, i1):
    gx0, gx1, gx2 = pd[0], pd[1], pd[2]
    base0 = jnp.floor(gx0 - 0.5)
    base1 = jnp.floor(gx1 - 0.5)
    base2 = jnp.floor(gx2 - 0.5)
    rel0 = base0 - i0.astype(jnp.float32)
    rel1 = base1 - i1.astype(jnp.float32)
    valid = (
        (rel0 >= -1.0) & (rel0 <= 1.0) & (rel1 >= -1.0) & (rel1 <= 1.0)
    ).astype(jnp.float32)
    w0 = _axis_weights(gx0 - base0)
    w1 = _axis_weights(gx1 - base1)
    w2 = _axis_weights(gx2 - base2)
    return gx0, gx1, gx2, base2, rel0, rel1, valid, w0, w1, w2


# ---------------------------------------------------------------------------
# P2G
# ---------------------------------------------------------------------------


def _chunk3d(k: int) -> int:
    """3D slot-axis chunk (128): pencils are small, so fine chunks let the
    count skip trim the bimodal occupancy (straddling pencils hold ~2x the
    average)."""
    nc = -(-k // 128)
    assert k % nc == 0, k
    return k // nc


def _p2g3d_kernel(counts_ref, pdata_ref, out_ref, *, g1: int, g2t: int, dx: float, kc: int):
    # Grid dims: (r0, n_g2_tiles, r1, n_k_chunks) — the z-axis tile index
    # must be OUTER to (i1, j) so the output block stays resident in VMEM
    # while accumulating over the fast (i1, chunk) dims.
    i0 = pl.program_id(0)
    tz = pl.program_id(1)
    i1 = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when((i1 == 0) & (j == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j * kc < counts_ref[i0 * pl.num_programs(2) + i1])
    def _body():
        _p2g3d_chunk(pdata_ref, out_ref, i0, i1, tz, g1=g1, g2t=g2t, dx=dx)


def _p2g3d_chunk(pdata_ref, out_ref, i0, i1, tz, *, g1: int, g2t: int, dx: float):
    pd = pdata_ref[0, 0]  # (26, KC)
    k = pd.shape[1]
    g2 = g2t
    gx0, gx1, gx2, base2, rel0, rel1, valid, w0, w1, w2 = _geom(pd, i0, i1)
    col0 = tz * g2t
    w_mat = _onehot_w(base2, w2, k, g2, col0)

    mv = (pd[3], pd[4], pd[5])
    p_aff = tuple(pd[6 + i] for i in range(9))    # row-major P
    q_aff = tuple(pd[15 + i] for i in range(9))
    mass, vol = pd[24], pd[25]

    wr0 = [_row_weights(rel0, w0, valid, t) for t in range(NT)]
    wr1 = [_row_weights(rel1, w1, jnp.ones_like(valid), t) for t in range(NT)]
    rdp0 = [(i0.astype(jnp.float32) + float(t - 1) - gx0) * dx for t in range(NT)]
    rdp1 = [(i1.astype(jnp.float32) + float(t - 1) - gx1) * dx for t in range(NT)]

    rows = []
    for t0 in range(NT):
        for t1 in range(NT):
            wr = wr0[t0] * wr1[t1]
            for a in range(3):  # pure momentum channels
                rows.append(
                    wr * (mv[a] + p_aff[3 * a] * rdp0[t0] + p_aff[3 * a + 1] * rdp1[t1])
                )
            for a in range(3):  # forced momentum channels
                rows.append(
                    wr * (mv[a] + q_aff[3 * a] * rdp0[t0] + q_aff[3 * a + 1] * rdp1[t1])
                )
            rows.append(wr * mass)
            rows.append(wr * vol)
            a2 = [wr * p_aff[3 * a + 2] * dx for a in range(3)] + [
                wr * q_aff[3 * a + 2] * dx for a in range(3)
            ]
            rows.extend(a2)
            rows.extend(a * gx2 for a in a2)

    a_mat = jnp.stack(rows)  # (25 * 20, K)
    o = jnp.dot(a_mat, w_mat, preferred_element_type=jnp.float32)  # (500, G2)

    colv = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, g2), 1).astype(jnp.float32)
    for t0 in range(NT):
        for t1 in range(NT):
            row = i1 + (t1 - 1)

            @pl.when((row >= 0) & (row < g1))
            def _(row=row, t0=t0, t1=t1):
                b = (t0 * NT + t1) * P2G_AROWS
                for ch in range(P2G_CH):
                    val = o[b + ch : b + ch + 1, :]
                    if ch < 6:
                        val = (
                            val
                            + o[b + 8 + ch : b + 9 + ch, :] * colv
                            - o[b + 14 + ch : b + 15 + ch, :]
                        )
                    out_ref[0, t0, ch, pl.ds(row, 1), :] += val


@functools.partial(jax.jit, static_argnames=("g1", "g2", "dx"))
def p2g3d(pdata: jax.Array, counts: jax.Array, g1: int, g2: int, dx: float) -> jax.Array:
    """pdata (R0, R1, 26, K), counts (R0*R1,) -> (R0, 5, 8, G1, G2)."""
    r0, r1, f, k = pdata.shape
    assert f == 6 + 18 + 2
    kc = _chunk3d(k)
    # Tile the z axis of the plane output block so it fits in VMEM
    # (~6 MB cap on the block: 5 * 8 * G1 * G2T * 4B).
    n_tz = 1
    while NT * P2G_CH * g1 * (g2 // n_tz) * 4 > 6 * 1024 * 1024:
        n_tz *= 2
    assert g2 % n_tz == 0, (g2, n_tz)
    g2t = g2 // n_tz
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r0, n_tz, r1, k // kc),
        in_specs=[
            pl.BlockSpec(
                (1, 1, f, kc),
                lambda i, tz, j, q, c: (i, j, 0, q),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, NT, P2G_CH, g1, g2t),
            lambda i, tz, j, q, c: (i, 0, 0, 0, tz),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_p2g3d_kernel, g1=g1, g2t=g2t, dx=dx, kc=kc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r0, NT, P2G_CH, g1, g2), jnp.float32),
        interpret=_interpret(),
    )(counts, pdata)


def fold_rows0(expanded: jax.Array) -> jax.Array:
    """(R0, 5, ch, G1, G2) -> (ch, G0, G1, G2)."""
    r, nt, ch, g1, g2 = expanded.shape
    buf = jnp.zeros((r + nt - 1, ch, g1, g2), expanded.dtype)
    for t in range(nt):
        buf = buf.at[t : t + r].add(expanded[:, t])
    return jnp.moveaxis(buf[1 : r + 1], 1, 0)


# ---------------------------------------------------------------------------
# G2P
# ---------------------------------------------------------------------------


def _g2p3d_kernel(counts_ref, pdata_ref, *refs, g2: int, dx: float, dinv: float, kc: int):
    grid_refs = refs[: NT * NT]
    out_ref = refs[NT * NT]
    i0 = pl.program_id(0)
    i1 = pl.program_id(1)
    j = pl.program_id(2)
    cnt = counts_ref[i0 * pl.num_programs(1) + i1]

    @pl.when(j * kc >= cnt)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(j * kc < cnt)
    def _body():
        _g2p3d_chunk(pdata_ref, grid_refs, out_ref, i0, i1, g2=g2, dx=dx, dinv=dinv)


def _g2p3d_chunk(pdata_ref, grid_refs, out_ref, i0, i1, *, g2: int, dx: float, dinv: float):
    pd = pdata_ref[0, 0]  # (4, K)
    k = pd.shape[1]
    gx0, gx1, gx2, base2, rel0, rel1, valid, w0, w1, w2 = _geom(pd, i0, i1)
    valid = valid * pd[3]

    # Transposed one-hot (G2, K): channels land on sublanes after the dot.
    rows_io = jax.lax.broadcasted_iota(jnp.int32, (g2, k), 0).astype(jnp.float32)
    w_t = jnp.zeros((g2, k), jnp.float32)
    for c in range(3):
        w_t = w_t + jnp.where(rows_io == base2[None, :] + c, w2[c][None, :], 0.0)

    colv = jax.lax.broadcasted_iota(jnp.int32, (1, g2), 1).astype(jnp.float32)
    gs = []
    for t0 in range(NT):
        for t1 in range(NT):
            gt = grid_refs[t0 * NT + t1][0, 0]   # (G2P_CH, G2)
            gs.append(gt)
            gs.append(gt * colv)
    gboth = jnp.concatenate(gs, axis=0)          # (25 * 12, G2)
    s = jnp.dot(gboth, w_t, preferred_element_type=jnp.float32)  # (300, K)

    wr0 = [_row_weights(rel0, w0, valid, t) for t in range(NT)]
    wr1 = [_row_weights(rel1, w1, jnp.ones_like(valid), t) for t in range(NT)]
    rdp0 = [(i0.astype(jnp.float32) + float(t - 1) - gx0) * dx for t in range(NT)]
    rdp1 = [(i1.astype(jnp.float32) + float(t - 1) - gx1) * dx for t in range(NT)]

    vpic = [jnp.zeros((k,), jnp.float32) for _ in range(3)]
    vold = [jnp.zeros((k,), jnp.float32) for _ in range(3)]
    c_out = [jnp.zeros((k,), jnp.float32) for _ in range(9)]
    for t0 in range(NT):
        for t1 in range(NT):
            wr = wr0[t0] * wr1[t1]
            b = (t0 * NT + t1) * 2 * G2P_CH
            for a in range(3):
                sv = s[b + a]
                svc = s[b + G2P_CH + a]
                colg = (svc - gx2 * sv) * dx
                vpic[a] = vpic[a] + wr * sv
                vold[a] = vold[a] + wr * s[b + 3 + a]
                c_out[3 * a] = c_out[3 * a] + dinv * wr * rdp0[t0] * sv
                c_out[3 * a + 1] = c_out[3 * a + 1] + dinv * wr * rdp1[t1] * sv
                c_out[3 * a + 2] = c_out[3 * a + 2] + dinv * wr * colg

    outs = vpic + vold + c_out + [jnp.zeros((k,), jnp.float32)] * 3
    for ix, vals in enumerate(outs):
        out_ref[0, 0, ix, :] = vals


@functools.partial(jax.jit, static_argnames=("dx", "dinv"))
def g2p3d(
    pdata2: jax.Array, counts: jax.Array, grid6: jax.Array, dx: float, dinv: float
) -> jax.Array:
    """pdata2 (R0, R1, 4, K), grid6 (R0, R1, 6, G2) -> (R0, R1, 18, K)."""
    r0, r1, _, k = pdata2.shape
    g2 = grid6.shape[3]
    padded = jnp.zeros((r0 + NT - 1, r1 + NT - 1, G2P_CH, g2), grid6.dtype)
    padded = padded.at[1 : r0 + 1, 1 : r1 + 1].set(grid6)

    kc = _chunk3d(k)
    grid_specs = [
        pl.BlockSpec(
            (1, 1, G2P_CH, g2),
            (lambda i, j, q, c, t0=t0, t1=t1: (i + t0, j + t1, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        for t0 in range(NT)
        for t1 in range(NT)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r0, r1, k // kc),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 4, kc), lambda i, j, q, c: (i, j, 0, q), memory_space=pltpu.VMEM
            ),
            *grid_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G2P_OUT, kc), lambda i, j, q, c: (i, j, 0, q), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_g2p3d_kernel, g2=g2, dx=dx, dinv=dinv, kc=kc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r0, r1, G2P_OUT, k), jnp.float32),
        interpret=_interpret(),
    )(counts, pdata2, *([padded] * (NT * NT)))
