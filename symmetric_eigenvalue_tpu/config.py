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


def _usable_hbm_bytes() -> float:
    """Usable device-memory budget for the byte-budgeted chunk formulas.

    Order: SE_HBM_BYTES env override; the device's own
    ``memory_stats()['bytes_limit']`` scaled by 0.9 (allocator headroom —
    the scheduler keeps transient buffers beyond any single formula's
    model); else 14.5e9, the measured-usable share of this machine's
    16 GB v5e.  Cached: devices() can hang ~minutes when the TPU tunnel
    is down, so probe once per process."""
    global _HBM_CACHE
    if _HBM_CACHE is not None:
        return _HBM_CACHE
    import os
    val = None
    env = os.environ.get("SE_HBM_BYTES")
    if env:
        try:
            val = float(env)
        except ValueError:
            val = None
    if val is None:
        try:
            stats = jax.devices()[0].memory_stats()
            limit = float(stats.get("bytes_limit", 0.0)) if stats else 0.0
            if limit > 1e9:
                val = 0.9 * limit
        except Exception:
            val = None
    _HBM_CACHE = val if val is not None else 14.5e9
    return _HBM_CACHE


_HBM_CACHE: Optional[float] = None


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
    # refine_chunk: column chunk for the inverse-iteration passes.  The
    #   Spike-style blocked solver (kernels/refine.py) stacks three
    #   right-hand sides and keeps LU factors + transformed rhs live: peak
    #   ~200 bytes per (row, column) element, so 2048 columns at n=16384 is
    #   ~6.7 GB — 8192 (vec_chunk) would be ~27 GB and OOM a 16 GB chip.
    refine_chunk: int = 2048
    # refine_block / refine_block_alt: row-block sizes for the Spike-style
    #   refinement solver, alternated between passes.  With a single size,
    #   shifts resonant with the block spectra (all blocks of a
    #   constant-coefficient T share eigenvalues: Poisson columns at index
    #   ~k*(nb-1)) hit clamped pivots in every block at once and the solve
    #   degrades; a second pass at a coprime-ish size is never resonant at
    #   the same shifts (observed: 53 Poisson columns >1e-12*||T|| at nb=128
    #   only).
    refine_block: int = 128
    refine_block_alt: int = 96
    # refine_block_rescue: third block size for the measured-residual rescue
    #   pass — columns whose spike/extra passes BOTH fail (e.g. the pair
    #   arithmetic's back-substitution cascade hit the clip at both sizes)
    #   get XLA-path passes at this size with explicitly measured residuals.
    refine_block_rescue: int = 64
    # refine_residual_factor: columns whose measured residual after the first
    #   pass exceeds factor * eps * ||T|| join the second refinement pass
    #   (catches solver-resonant columns whose eigenvalue gaps are wide —
    #   gap-based selection alone misses them).
    refine_residual_factor: float = 50.0
    # mixed precision: run the downsweep's big matmuls in float32 (full MXU
    # rate, ~8x the emulated-f64 dot) and restore working-precision residuals
    # with one f64 inverse-iteration pass + cluster re-orthonormalization
    # (kernels/refine.py).  Staged/CLI path only; measured identical max
    # residual to the f64 path at n=16384 (3.9e-14*||T||) at 2.1x the speed.
    mixed_precision_vectors: bool = True
    refine_steps: int = 2
    # use_pallas_refine: route the f64 inverse-iteration passes through the
    #   Pallas Spike kernels (kernels/pallas/spike_solve.py) on TPU: the XLA
    #   scans dispatch nb + P sequential fused kernels per column chunk
    #   (~0.1 ms in-jit floor each — pure latency), the kernel loops cost
    #   nanoseconds per row.  No effect off-TPU.
    use_pallas_refine: bool = True
    # use_pallas_refine_extra: use the Spike kernel for the RISKY-column
    #   extra pass too.  Default False: the extra pass's bucket is narrow
    #   (XLA's blocked-scan latency is a few tens of ms there), and the XLA
    #   solver's emulated-f64 arithmetic leaves measurably less mixing /
    #   residual on block-resonant and tight-gap columns than the pair
    #   kernel (Poisson n=16384: 5e-13 vs 2.1e-12 residual, 6e-11 vs 4.2e-9
    #   orthogonality) — exactly the columns the extra pass exists for.
    use_pallas_refine_extra: bool = False
    # Mixed-precision refinement thresholds (both relative to ||T||):
    #
    # refine_risky_gap_factor: the explicit-orthonormalization band, in units
    #   of eps_f32 * ||T||.  The f32 downsweep leaves intra-cluster mixing
    #   O(eps_f32*||T||/gap); one f64 inverse-iteration pass shrinks it by
    #   ~(lam_err/gap) ~ (10*eps*||T||/gap), so gaps >= 100*eps_f32*||T||
    #   reach <=1e-11 orthogonality in one pass.  Segments with any gap BELOW
    #   that are batch-CholeskyQR'd after the first pass (driver ortho_mid) —
    #   exact orthogonality at residual cost mixing*gap <= ~1e-13*||T||.
    #   (Round-2 instead ran a second refinement pass over every such column;
    #   round-3 profiling showed 2842/2843 of them needed no residual work —
    #   ~0.5 s of solves at n=16384 replaced by the wider CholeskyQR band.)
    refine_risky_gap_factor: float = 100.0
    # cluster_gap_factor: gaps below factor * ||T|| are treated as degenerate
    #   clusters and re-orthonormalized by QR (dstein-style) — inverse iteration
    #   cannot separate them, but any orthonormal basis of the cluster subspace
    #   has an equally small residual.  With two passes, contamination at gap g
    #   is ~ (eps_f32*||T||/g) * (10*eps*||T||/g): at g = 1e-8*||T|| that is
    #   ~ 6e-8/1e-8 * 3.6e-14/1e-8 ~ 2e-5... saturated at 1, times 3.6e-6 ->
    #   <= ~4e-6 entering pass 2 and <=1e-11 after it; below 1e-8*||T|| the
    #   second factor saturates and QR is required.  Keep tight: smooth spectra
    #   have thousands of gaps just above any loose threshold and every extra
    #   QR segment costs host-loop dispatches.
    cluster_gap_factor: float = 1e-8
    # ortho_gap_factor: FLOOR of the dstein-style explicit orthogonalization
    #   threshold (relative to ||T||).  The driver's mid/final cleanup band is
    #   max(ortho_gap_factor, refine_risky_gap_factor * u_f32) ~ 6e-6: columns
    #   whose gaps sit in [cluster_gap_factor, band) are separable by inverse
    #   iteration in exact arithmetic, but the f32 downsweep leaves them with
    #   O(eps_f32*||T||/gap) mutual mixing that refinement shrinks only by
    #   (lam_err/gap) per pass — at gap ~ 1e-7*||T|| that stalls around 1e-6
    #   (the round-2 Poisson blemish).  So after the first refinement pass
    #   these segments are explicitly orthonormalized (batched CholeskyQR —
    #   residual cost is mixing*gap, ~1e-13*||T|| worst case).  LAPACK
    #   dstein's ortol plays the same role (ref analog: getEigenVector,
    #   eigenvalues.c:291-358).
    ortho_gap_factor: float = 1e-6
    # single_jit_max_n: largest n (with eigenvectors) the single-jit
    #   ``solve_tridiagonal`` path handles itself; above it the call
    #   auto-routes to the staged/column-chunked implementation.  ``None``
    #   auto-detects: on TPU the whole-solve single jit OOMs at n=16384 f64
    #   (XLA co-schedules several full-width eigenvector temporaries), so the
    #   threshold is 8192 there and unlimited elsewhere.
    single_jit_max_n: Optional[int] = None

    def resolved_refine_chunk(self, n: int) -> int:
        """Byte-budgeted refinement column chunk.

        The Spike solver + measured-residual passes peak ~200 bytes per
        (row, column) element (LU factors + transformed rhs + X64Split f32
        halves).  During the first pass the f32 downsweep output (4 bytes/
        elem) AND the accumulating f64 refined columns (8 bytes/elem) are
        both live, so the real peak is 12*n^2 + 200*n*chunk.  A fixed
        refine_chunk=2048 OOM'd the 16 GB chip at n=32768 (round-3
        BENCH_EXTRA: ~20 x 256 MB f32[32768,2048] X64Split temps).  Budget
        against the device's usable HBM (memory_stats when the backend
        exposes it, SE_HBM_BYTES override, else ~14.5 GB — this machine's
        v5e), floored at 256 and capped at the configured refine_chunk —
        n<=16384 keeps chunk 2048 (measured-good), n=32768 resolves to
        256."""
        budget = _usable_hbm_bytes() - 12.0 * float(n) * float(n)
        cols = int(budget / (200.0 * max(n, 1)))
        chunk = 256
        while chunk * 2 <= cols and chunk * 2 <= self.refine_chunk:
            chunk *= 2
        return min(chunk, self.refine_chunk)

    def resolved_single_jit_max_n(self) -> int:
        if self.single_jit_max_n is not None:
            return int(self.single_jit_max_n)
        try:
            if jax.default_backend() == "tpu":
                return 8192
        except Exception:
            pass
        return 1 << 62

    def eps(self) -> float:
        if self.unit_roundoff is not None:
            return float(self.unit_roundoff)
        return default_unit_roundoff(self.dtype)

    def resolved_leaf_size(self, n: Optional[int] = None) -> int:
        """Auto leaf size: 32 on CPU/GPU (LAPACK-backed batched eigh), 64 on
        TPU — the round-robin batched Jacobi makes bigger leaves cheap, and
        one fewer tree level wins more than the leaf stage costs (measured
        n=16384: 2.79 s at leaf 64 vs 2.98 at 128 vs ~2.9+ at 32;
        tools/leaf_retune.py).  On TPU the leaf count is additionally capped
        at 1024: a 2048-block Jacobi batch at n=65536 reproducibly faults
        the device (leaf 64 at the same n is fine)."""
        if self.leaf_size is not None:
            return self.leaf_size
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        leaf = 64 if on_tpu else 32
        if n is not None and on_tpu:
            while n // leaf > 1024:
                leaf *= 2
        return leaf

    def __hash__(self):
        return hash((self.leaf_size, self.max_leaves, str(self.dtype),
                     self.unit_roundoff, self.deflation_factor,
                     self.max_secular_iters, self.secular_tol_factor,
                     self.use_gu_eisenstat, self.block_size, self.vec_chunk,
                     self.refine_chunk,
                     self.refine_block, self.refine_block_alt,
                     self.refine_block_rescue,
                     self.refine_residual_factor,
                     self.mixed_precision_vectors, self.refine_steps,
                     self.use_pallas_refine, self.use_pallas_refine_extra,
                     self.refine_risky_gap_factor, self.cluster_gap_factor,
                     self.ortho_gap_factor, self.single_jit_max_n))


DEFAULT_CONFIG = SolverConfig()
