"""symmetric_eigenvalue_tpu: TPU-native parallel Cuppen divide-and-conquer
eigensolver for real symmetric (tridiagonal) matrices.

A from-scratch JAX/XLA re-architecture of ``chrhenning/symmetric_eigenvalue``
(the MPI+OpenMP+MKL C program ``cuppens``): same capabilities — all eigenpairs of
a real symmetric tridiagonal matrix via rank-one tearing, secular-equation root
finding with deflation, and eigenvector backtransformation up the merge tree —
designed TPU-first: batched per-level merge kernels under vmap, sharding instead
of MPI messages, and blocked MXU matmuls instead of row-at-a-time pipelines.
"""

import os as _os

import jax as _jax

# float64 end-to-end is required for the 1e-12*||T|| residual target; on TPU it
# is emulated float32-pair arithmetic (unit roundoff ~2^-48).  Importing the
# package enables x64 by default because every default config assumes it; set
# SYMMETRIC_EIGENVALUE_TPU_NO_X64=1 to opt out (then pass dtype=jnp.float32
# configs, or enable x64 yourself before solving in float64).
if _os.environ.get("SYMMETRIC_EIGENVALUE_TPU_NO_X64", "0") != "1":
    _jax.config.update("jax_enable_x64", True)

from .config import DEFAULT_CONFIG, SolverConfig  # noqa: E402
from .core.tridiag import (  # noqa: E402
    create_matrix_scheme1,
    create_matrix_scheme2,
    eigenvalues_of_scheme2,
    residual_norms,
    tridiag_matvec,
)
from .driver import (  # noqa: E402
    EighTridiagonalResult,
    eigh,
    eigh_banded,
    eigh_tridiagonal,
    residuals,
    solve_tridiagonal,
    solve_tridiagonal_staged,
    solve_tridiagonal_streamed,
)

__all__ = [
    "DEFAULT_CONFIG",
    "SolverConfig",
    "EighTridiagonalResult",
    "create_matrix_scheme1",
    "eigh",
    "eigh_banded",
    "create_matrix_scheme2",
    "eigenvalues_of_scheme2",
    "eigh_tridiagonal",
    "residual_norms",
    "residuals",
    "solve_tridiagonal",
    "solve_tridiagonal_staged",
    "solve_tridiagonal_streamed",
    "tridiag_matvec",
]

__version__ = "0.2.0"
