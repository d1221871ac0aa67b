"""Stage-1 SBR (dense -> band) correctness vs dense numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetric_eigenvalue_tpu.kernels.band_reduce import reduce_to_band
from symmetric_eigenvalue_tpu.kernels.tridiagonalize import apply_q


@pytest.mark.parametrize("n,b", [(64, 8), (96, 16), (100, 8), (33, 8),
                                 (40, 40)])
def test_reduce_to_band(n, b, rng):
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    B, Yt, taus = jax.jit(lambda A: reduce_to_band(A, b))(jnp.asarray(A))
    B = np.asarray(B)

    # band structure
    mask = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) > b
    assert np.abs(np.where(mask, B, 0.0)).max() < 1e-13

    # orthogonal similarity: same spectrum, and A Q = Q B with the
    # compact-WY application (reflector rows shifted by b reuse apply_q)
    w0 = np.linalg.eigvalsh(A)
    w1 = np.linalg.eigvalsh((B + B.T) / 2)
    assert np.abs(w0 - w1).max() < 1e-12 * max(np.abs(w0).max(), 1.0)
    Q = np.asarray(apply_q(Yt, taus, jnp.eye(n, dtype=jnp.float64),
                           panel=b))
    assert np.abs(A @ Q - Q @ B).max() < 1e-12
    assert np.abs(Q.T @ Q - np.eye(n)).max() < 1e-13


def test_reduce_to_band_small_noop(rng):
    # n <= b + 1: already banded, identity transform
    A = rng.standard_normal((6, 6))
    A = (A + A.T) / 2
    B, Yt, taus = reduce_to_band(jnp.asarray(A), 8)
    assert np.abs(np.asarray(B) - A).max() == 0.0
    assert np.asarray(taus).max() == 0.0
