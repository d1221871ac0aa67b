"""Self-check helpers: f64-grade orthogonality measurement that fits in HBM.

The reference writes a per-eigenvector residual next to every eigenvalue as
its de-facto integration test (filehandling.c:511-537).  Mutual orthogonality
is the complementary check for the eigenvector *basis*, and measuring it on
TPU is its own numerics problem:

  * f32 Gram matrices cannot resolve it: even at precision=HIGHEST the
    accumulation error over n=16384-term dots is ~sqrt(n)*2^-24 ~ 5e-7 —
    above the 1e-10 target being verified;
  * a whole-matrix f32-HIGHEST ``V.T @ V`` at n=16384 OOMs outright: XLA
    expands the HIGHEST contraction into bf16 passes and materializes
    [passes, n, n] temporaries (~28 GB observed on v5e, 16 GB HBM);
  * XLA's emulated-f64 dot runs at ~0.1 TFLOP/s (CLAUDE.md), i.e. ~90 s for
    the n=16384 Gram.

So: compute the Gram in row blocks with the MXU-rate double-word GEMM kernel
(kernels/pallas/dword_matmul, ~2^-47-grade) and fold each block's
``max |G - I|`` on device — peak extra HBM is the rhs slice set (~3 GB at
n=16384) instead of [passes, n, n], and only one scalar per block crosses
the host link.  On CPU backends (native f64) a plain blocked jnp Gram is
used instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _gram_block_err(n: int, chunk: int, dtype_name: str, use_dword: bool):
    """jit(V, r0) -> max |(Vᵀ V)[r0:r0+chunk, :] - I[r0:r0+chunk, :]|."""

    def f(V, r0):
        Vt = jax.lax.dynamic_slice_in_dim(V.T, r0, chunk, axis=0)
        if use_dword:
            from ..kernels.pallas.dword_matmul import dword_matmul
            G = dword_matmul(Vt, V)
        else:
            G = Vt @ V
        cols = jnp.arange(n)[None, :]
        rows = r0 + jnp.arange(chunk)[:, None]
        # rows >= n only occur on a padded last chunk of a non-divisible n;
        # those Vᵀ rows read garbage via clamp, so mask them out entirely
        err = jnp.abs(G - (rows == cols).astype(G.dtype))
        return jnp.max(jnp.where(rows < n, err, 0.0))

    return jax.jit(f, static_argnames=())


@functools.lru_cache(maxsize=None)
def _cross_gram_err(ga: int, gb: int, chunk: int, dtype_name: str,
                    use_dword: bool):
    """jit(Va, Vb, r0) -> max |(Vaᵀ Vb)[r0:r0+chunk, :]| (off-basis Gram)."""

    def f(Va, Vb, r0):
        Vt = jax.lax.dynamic_slice_in_dim(Va.T, r0, chunk, axis=0)
        if use_dword:
            from ..kernels.pallas.dword_matmul import dword_matmul
            G = dword_matmul(Vt, Vb)
        else:
            G = Vt @ Vb
        rows = r0 + jnp.arange(chunk)[:, None]
        return jnp.max(jnp.where(rows < ga, jnp.abs(G), 0.0))

    return jax.jit(f)


def max_cross_ortho_error(Va, Vb, row_chunk: int = 2048) -> float:
    """max |Vaᵀ Vb| between two disjoint eigenvector column groups.

    Used by the streamed huge-n full-eigenpair runs, where the basis never
    fits on device at once: adjacent groups carry the near-degenerate
    cluster risk, so their cross-Gram plus each group's own
    :func:`max_ortho_error` covers mutual orthogonality without holding
    the whole basis."""
    ga = int(Va.shape[1])
    use_dword = jax.default_backend() == "tpu"
    chunk = min(row_chunk, ga)
    fn = _cross_gram_err(ga, int(Vb.shape[1]), chunk, str(Va.dtype),
                         use_dword)
    worst = 0.0
    for r0 in range(0, ga, chunk):
        r0 = min(r0, ga - chunk)
        worst = max(worst, float(fn(Va, Vb, r0)))
    return worst


def max_ortho_error(V, row_chunk: int = 2048) -> float:
    """max |VᵀV - I| of an (n, n) eigenvector matrix, f64-grade, blocked.

    Accuracy: ~n * 2^-47 per Gram entry on TPU (double-word GEMM) /
    native f64 on CPU — far below the 1e-10 orthogonality targets it is
    used to verify.
    """
    n = V.shape[1]
    use_dword = jax.default_backend() == "tpu"
    chunk = min(row_chunk, n)
    fn = _gram_block_err(n, chunk, str(V.dtype), use_dword)
    worst = 0.0
    for r0 in range(0, n, chunk):
        # dynamic_slice clamps r0 so a ragged last chunk re-reads earlier
        # rows; the rows>=n mask in the kernel keeps the result exact only
        # when r0+chunk<=n, so clamp and let overlapping rows recompute
        r0 = min(r0, n - chunk)
        worst = max(worst, float(fn(V, r0)))
    return worst
