"""CPU oracle solvers — the numerical ground truth for the test suite.

The reference's entire QA strategy is cross-implementation validation
against its C++ solver (reference: README.md:27-35, SURVEY.md section 4).
This package re-implements that solver's exact per-substep semantics in
NumPy (and, in `native/`, in C++) so the JAX/Pallas kernels can be asserted
against it substep-by-substep.
"""

from mpm_flip98a_tpu.oracle.mls_mpm88_numpy import (
    OracleState,
    advance,
    init_dam_break,
)
