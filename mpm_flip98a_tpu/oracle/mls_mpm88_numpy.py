"""NumPy oracle: exact re-implementation of the reference validation solver.

Reference: cpp_validation/mls-mpm88-explained.cpp (2D MLS-MPM, fixed
corotated elasticity with snow plasticity, fp32).  This module reproduces
its per-substep semantics operation-for-operation — same base-cell
convention (:55), same quadratic B-spline (:60-64), same hardening-scaled
Lame parameters (:67-69), same fused APIC+stress affine scatter (:89-99),
same grid normalisation/gravity/boundary handling (:104-131), and the same
G2P + MLS F-update + SVD clamp (:133-179) — in vectorized NumPy.

It is the ground truth that the JAX solver (`models/mls_mpm.py`) and the
Pallas kernels must match to <= 1e-5 per substep in fp32 (BASELINE.json
north star).  `np.add.at` gives a deterministic, sequential scatter order.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mpm_flip98a_tpu.config import MLS88Config


@dataclasses.dataclass
class OracleState:
    """SoA particle state (reference: mls-mpm88-explained.cpp:28-42)."""

    x: np.ndarray   # (N, 2)
    v: np.ndarray   # (N, 2)
    F: np.ndarray   # (N, 2, 2)
    C: np.ndarray   # (N, 2, 2)
    Jp: np.ndarray  # (N,)

    def copy(self) -> "OracleState":
        return OracleState(
            self.x.copy(), self.v.copy(), self.F.copy(), self.C.copy(), self.Jp.copy()
        )


def init_dam_break(
    n: int = 3000, seed: int = 0, dtype=np.float32, cfg: MLS88Config = MLS88Config()
) -> OracleState:
    """Seed a fluid block like the reference scene: n particles uniform in a
    0.16 x 0.16 square centered at (0.13, 0.13)
    (reference: mls-mpm88-explained.cpp:191-201; the C++ uses taichi's
    xorshift RNG — positions differ, distribution and block match)."""
    rng = np.random.default_rng(seed)
    x = (rng.random((n, 2), dtype=np.float64) * 2.0 - 1.0) * 0.08 + np.array(
        [0.05 + 0.08, 0.05 + 0.08]
    )
    x = x.astype(dtype)
    eye = np.broadcast_to(np.eye(2, dtype=dtype), (n, 2, 2)).copy()
    return OracleState(
        x=x,
        v=np.zeros((n, 2), dtype),
        F=eye,
        C=np.zeros((n, 2, 2), dtype),
        Jp=np.ones((n,), dtype),
    )


def _polar_decomp_2d(m: np.ndarray):
    """(reference: taichi.h:8375-8385)"""
    x = m[:, 0, 0] + m[:, 1, 1]
    y = m[:, 1, 0] - m[:, 0, 1]
    scale = 1.0 / np.sqrt(x * x + y * y)
    c = x * scale
    s = y * scale
    r = np.empty_like(m)
    r[:, 0, 0] = c
    r[:, 0, 1] = -s
    r[:, 1, 0] = s
    r[:, 1, 1] = c
    s_mat = np.swapaxes(r, 1, 2) @ m
    return r, s_mat


def _svd_2d(m: np.ndarray):
    """(reference: taichi.h:8389-8419, Jiang et al. Algorithm 4)"""
    u, s_m = _polar_decomp_2d(m)
    s00, s01, s11 = s_m[:, 0, 0], s_m[:, 0, 1], s_m[:, 1, 1]
    small = np.abs(s01) < 1e-6
    tao = 0.5 * (s00 - s11)
    w = np.sqrt(tao * tao + s01 * s01)
    denom = np.where(tao > 0, tao + w, tao - w)
    denom = np.where(small, 1.0, denom)
    t = s01 / denom
    c = np.where(small, 1.0, 1.0 / np.sqrt(t * t + 1.0))
    s = np.where(small, 0.0, -t * c)
    sig0 = np.where(small, s00, c * c * s00 - 2 * c * s * s01 + s * s * s11)
    sig1 = np.where(small, s11, s * s * s00 + 2 * c * s * s01 + c * c * s11)
    swap = sig0 < sig1
    sig = np.stack([np.where(swap, sig1, sig0), np.where(swap, sig0, sig1)], axis=-1)
    v = np.empty_like(m)
    v[:, 0, 0] = np.where(swap, -s, c)
    v[:, 0, 1] = np.where(swap, -c, -s)
    v[:, 1, 0] = np.where(swap, c, s)
    v[:, 1, 1] = np.where(swap, -s, c)
    v = np.swapaxes(v, 1, 2)
    u = u @ v
    return u, sig, v


def advance(state: OracleState, cfg: MLS88Config = MLS88Config()) -> OracleState:
    """One substep, mutating semantics of mls-mpm88-explained.cpp:49-180
    expressed functionally: returns the next state."""
    p = state.copy()
    dt = np.asarray(cfg.dt, p.x.dtype)
    dx = np.asarray(cfg.dx, p.x.dtype)
    inv_dx = np.asarray(cfg.inv_dx, p.x.dtype)
    n = p.x.shape[0]
    gshape = cfg.grid_shape

    # Grid: [m vx, m vy, m] per node (reference: :46-47).
    grid = np.zeros(gshape + (3,), p.x.dtype)

    # ---- P2G (reference: :53-102) ------------------------------------
    base = (p.x * inv_dx - 0.5).astype(np.int32)          # :55 (trunc == floor here)
    fx = p.x * inv_dx - base                              # :57
    w = np.stack(                                         # :60-64
        [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1.0) ** 2, 0.5 * (fx - 0.5) ** 2],
        axis=1,
    )  # (N, 3, 2)

    e = np.exp(cfg.hardening * (1.0 - p.Jp))              # :67
    mu = np.asarray(cfg.mu_0, p.x.dtype) * e              # :68
    lam = np.asarray(cfg.lambda_0, p.x.dtype) * e         # :69
    J = p.F[:, 0, 0] * p.F[:, 1, 1] - p.F[:, 0, 1] * p.F[:, 1, 0]  # :72
    r, _ = _polar_decomp_2d(p.F)                          # :74-76
    dinv = 4.0 * inv_dx * inv_dx                          # :79
    ft = np.swapaxes(p.F, 1, 2)
    pf = (2.0 * mu)[:, None, None] * ((p.F - r) @ ft) + (
        (lam * (J - 1.0) * J)[:, None, None] * np.eye(2, dtype=p.x.dtype)
    )                                                     # :81 (scalar adds to diagonal)
    stress = -(dt * cfg.vol_p) * (dinv * pf)              # :84
    affine = stress + cfg.mass_p * p.C                    # :89

    mv = cfg.mass_p * p.v                                 # :96
    for i in range(3):                                    # :92-101
        for j in range(3):
            dpos = (np.array([i, j], p.x.dtype) - fx) * dx
            wij = w[:, i, 0] * w[:, j, 1]
            contrib = np.concatenate(
                [
                    mv + np.einsum("nab,nb->na", affine, dpos),
                    np.full((n, 1), cfg.mass_p, p.x.dtype),
                ],
                axis=1,
            )
            np.add.at(
                grid.reshape(-1, 3),
                (base[:, 0] + i) * gshape[1] + (base[:, 1] + j),
                wij[:, None] * contrib,
            )

    # ---- grid update (reference: :104-131) ---------------------------
    m_node = grid[..., 2]
    has_mass = m_node > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        g_norm = grid / m_node[..., None]                 # :110 (g /= g[2])
    g_norm[..., 1] += dt * cfg.gravity                    # :113
    coords = np.arange(cfg.num_nodes, dtype=p.x.dtype) / cfg.num_grid  # :118-119
    xg = coords[:, None]
    yg = coords[None, :]
    b = cfg.boundary
    sticky = (xg < b) | (xg > 1 - b) | (yg > 1 - b)       # :122-124
    g_norm = np.where((sticky & has_mass)[..., None], 0.0, g_norm)
    sep = (yg < b) & has_mass                             # :126-128
    g_norm[..., 1] = np.where(sep, np.maximum(0.0, g_norm[..., 1]), g_norm[..., 1])
    grid = np.where(has_mass[..., None], g_norm, 0.0).astype(p.x.dtype)

    # ---- G2P (reference: :133-179) -----------------------------------
    new_v = np.zeros_like(p.v)                            # :145
    new_c = np.zeros_like(p.C)                            # :144
    for i in range(3):                                    # :147-155
        for j in range(3):
            dpos = np.array([i, j], p.x.dtype) - fx       # :149 (grid units)
            gv = grid[base[:, 0] + i, base[:, 1] + j, :2]  # :150
            wij = (w[:, i, 0] * w[:, j, 1])[:, None]
            new_v = new_v + wij * gv                      # :153
            new_c = new_c + 4.0 * inv_dx * (
                (wij * gv)[:, :, None] * dpos[:, None, :]
            )                                             # :154 outer(w gv, dpos)

    p.v = new_v
    p.C = new_c
    p.x = p.x + dt * p.v                                  # :159
    f_trial = (
        np.eye(2, dtype=p.x.dtype)[None] + dt * p.C
    ) @ p.F                                               # :162
    u, sig, v = _svd_2d(f_trial)                          # :164-165
    if cfg.plastic:                                       # :167-170
        sig = np.clip(sig, 1.0 - 2.5e-2, 1.0 + 7.5e-3)
    old_j = f_trial[:, 0, 0] * f_trial[:, 1, 1] - f_trial[:, 0, 1] * f_trial[:, 1, 0]  # :172
    f_new = u @ (sig[:, :, None] * np.swapaxes(v, 1, 2))  # :173 U diag(sig) V^T
    det_new = f_new[:, 0, 0] * f_new[:, 1, 1] - f_new[:, 0, 1] * f_new[:, 1, 0]
    p.Jp = np.clip(p.Jp * old_j / det_new, 0.6, 20.0).astype(p.x.dtype)  # :175-177
    p.F = f_new
    return p
