"""Solver configuration.

The reference (``/root/reference/src/eigenvalues.c:72,77,109``) hard-codes absolute
deflation thresholds (|z_i| < 1e-6, |d_i - d_j| < 1e-5) and a bisection tolerance of
(b-a)/2 < 1e-14 (``eigenvalues.c:146,235``).  The TPU build uses *relative*,
LAPACK-``dlaed2``-style criteria so accuracy scales with ||T|| (set
``unit_roundoff``/``deflation_factor`` to reproduce looser behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

# Effective unit roundoff of emulated float64 on TPU (float32-pair arithmetic,
# ~2^-48).  CPU/GPU float64 is true IEEE double (2^-52).
_TPU_F64_EPS = 2.0 ** -48
_IEEE_F64_EPS = 2.0 ** -52


def default_unit_roundoff(dtype=jnp.float64) -> float:
    if dtype == jnp.float64:
        try:
            if jax.default_backend() == "tpu":
                return _TPU_F64_EPS
        except Exception:
            pass
        return _IEEE_F64_EPS
    return float(jnp.finfo(dtype).eps)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static configuration for the Cuppen divide-and-conquer solver.

    Attributes:
      leaf_size: target size of the base-case blocks solved by the batched dense
        leaf eigensolver (ref: the per-rank ``LAPACKE_dsteqr`` call, main.c:460).
        ``1`` means pure secular recursion all the way down (no dense leaf solve).
      max_leaves: optional cap on the number of leaves (analog of the reference's
        ``NUMTASKS``); the tree always uses a power-of-two leaf count.
      dtype: compute dtype. float64 is required for the 1e-12*||T|| residual target.
      unit_roundoff: effective machine epsilon used for deflation / convergence
        tests.  ``None`` auto-detects (TPU-emulated f64 has eps ~ 2^-48).
      deflation_factor: relative deflation threshold multiplier; entries are
        deflated when their perturbation is <= deflation_factor * eps * scale(T)
        (LAPACK dlaed2 uses 8).
      max_secular_iters: iteration cap for the safeguarded-Newton secular root
        finder (ref bisection cap: 10000, eigenvalues.c:146; Newton needs far
        fewer as it converges quadratically).
      secular_tol_factor: stop when |f(tau)| <= factor * eps * (1 + |weights|).
      use_gu_eisenstat: recompute the z-vector from the solved eigenvalues via the
        Lowner/ dlaed3 formula so eigenvectors are orthogonal to working precision
        even for clustered spectra.
    """

    leaf_size: Optional[int] = None
    max_leaves: Optional[int] = None
    dtype: object = jnp.float64
    unit_roundoff: Optional[float] = None
    deflation_factor: float = 8.0
    max_secular_iters: int = 60
    secular_tol_factor: float = 8.0
    use_gu_eisenstat: bool = True
    block_size: int = 2048
    vec_chunk: int = 8192
    # mixed precision: run the downsweep's big matmuls in float32 (full MXU
    # rate, ~8x the emulated-f64 dot) and restore working-precision residuals
    # with one f64 inverse-iteration pass + cluster re-orthonormalization
    # (kernels/refine.py).  Staged/CLI path only; measured identical max
    # residual to the f64 path at n=16384 (3.9e-14*||T||) at 2.1x the speed.
    mixed_precision_vectors: bool = True
    refine_steps: int = 2

    def eps(self) -> float:
        if self.unit_roundoff is not None:
            return float(self.unit_roundoff)
        return default_unit_roundoff(self.dtype)

    def resolved_leaf_size(self, n: Optional[int] = None) -> int:
        """Auto leaf size: 32 — LAPACK-backed batched eigh on CPU/GPU, batched
        cyclic Jacobi on TPU (XLA's own eigh is only ~1e-7-residual under TPU's
        emulated f64; see kernels/leaf.py).  On TPU the leaf count is capped at
        1024: a 2048-block Jacobi batch at n=65536 reproducibly faults the
        device (leaf 64 at the same n is fine)."""
        if self.leaf_size is not None:
            return self.leaf_size
        leaf = 32
        if n is not None:
            try:
                on_tpu = jax.default_backend() == "tpu"
            except Exception:
                on_tpu = False
            if on_tpu:
                while n // leaf > 1024:
                    leaf *= 2
        return leaf

    def __hash__(self):
        return hash((self.leaf_size, self.max_leaves, str(self.dtype),
                     self.unit_roundoff, self.deflation_factor,
                     self.max_secular_iters, self.secular_tol_factor,
                     self.use_gu_eisenstat, self.block_size, self.vec_chunk,
                     self.mixed_precision_vectors, self.refine_steps))


DEFAULT_CONFIG = SolverConfig()
