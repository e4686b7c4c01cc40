"""ctypes bindings for the native C++ oracle (native/mpm_oracle.cpp).

Builds `libmpm_oracle.so` on first use via `make -C native` (g++, no
pybind11 required).  Exposes the same functional `advance` interface as
the NumPy oracle so tests can cross-validate C++ vs NumPy vs JAX/Pallas —
the reference's own QA strategy (README.md:27-35) done three-way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import numpy as np

from mpm_flip98a_tpu.config import MLS88Config
from mpm_flip98a_tpu.oracle.mls_mpm88_numpy import OracleState

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmpm_oracle.so")
_lib = None


class _Params(ctypes.Structure):
    _fields_ = [
        ("num_grid", ctypes.c_int),
        ("dt", ctypes.c_float),
        ("mass_p", ctypes.c_float),
        ("vol_p", ctypes.c_float),
        ("hardening", ctypes.c_float),
        ("mu_0", ctypes.c_float),
        ("lambda_0", ctypes.c_float),
        ("gravity", ctypes.c_float),
        ("boundary", ctypes.c_float),
        ("plastic", ctypes.c_int),
    ]


def build(force: bool = False) -> str:
    # Always invoke make: its timestamp check is a no-op when the .so is
    # fresh, and source edits rebuild instead of silently loading a stale
    # binary (ADVICE r3).  `force` kept for API compat.
    del force
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        path = build()
        _lib = ctypes.CDLL(path)
        fp = ctypes.POINTER(ctypes.c_float)
        _lib.mpm88_advance.argtypes = [
            fp, fp, fp, fp, fp,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_Params), fp,
        ]
        _lib.mpm88_advance.restype = None
    return _lib


def advance(
    state: OracleState, cfg: MLS88Config = MLS88Config(), steps: int = 1
) -> OracleState:
    """Functional wrapper: returns the state after `steps` substeps."""
    lib = _get_lib()
    # Copy unconditionally: the C call mutates the buffers in place, and
    # ascontiguousarray would alias an already-contiguous fp32 input.
    s = OracleState(
        np.array(state.x, np.float32, order="C"),
        np.array(state.v, np.float32, order="C"),
        np.array(state.F, np.float32, order="C"),
        np.array(state.C, np.float32, order="C"),
        np.array(state.Jp, np.float32, order="C"),
    )
    prm = _Params(
        num_grid=cfg.num_grid,
        dt=cfg.dt,
        mass_p=cfg.mass_p,
        vol_p=cfg.vol_p,
        hardening=cfg.hardening,
        mu_0=cfg.mu_0,
        lambda_0=cfg.lambda_0,
        gravity=cfg.gravity,
        boundary=cfg.boundary,
        plastic=int(cfg.plastic),
    )
    fp = ctypes.POINTER(ctypes.c_float)
    lib.mpm88_advance(
        s.x.ctypes.data_as(fp),
        s.v.ctypes.data_as(fp),
        s.F.ctypes.data_as(fp),
        s.C.ctypes.data_as(fp),
        s.Jp.ctypes.data_as(fp),
        s.x.shape[0],
        steps,
        ctypes.byref(prm),
        None,
    )
    return s
