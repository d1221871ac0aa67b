"""Pallas MXU-sliced f64 GEMM, run in interpreter mode on CPU.

On-TPU counterpart: tools/check_pallas_on_tpu.py (recorded in PARITY.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

import symmetric_eigenvalue_tpu.kernels.pallas.dword_matmul as dmm


@pytest.fixture
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(dmm.pl, "pallas_call", patched)


def _check(A, B, tol):
    Y = np.asarray(dmm.dword_matmul(jnp.asarray(A), jnp.asarray(B)))
    ref = np.asarray(A, np.longdouble) @ np.asarray(B, np.longdouble)
    scale = np.abs(np.asarray(A, np.float64)) @ np.abs(np.asarray(B, np.float64))
    rel = (np.abs(Y - np.asarray(ref, np.float64)) /
           np.maximum(scale, 1e-300)).max()
    assert rel < tol, rel


def test_square(interpreted, rng):
    n = 256
    _check(rng.standard_normal((n, n)), rng.standard_normal((n, n)), 5e-14)


def test_rectangular_skinny_k(interpreted, rng):
    # trailing-update shape: K = 2*panel < one k-block (zero-padded)
    _check(rng.standard_normal((256, 64)), rng.standard_normal((64, 256)),
           5e-14)


def test_wide_dynamic_range(interpreted, rng):
    # rows/columns spanning 16 orders of magnitude: per-block power-of-two
    # scaling must keep every row/column at full relative accuracy.  (Beyond
    # ~1e-20 product magnitudes the f32 compensation channels denormalize —
    # the same place the platform's own emulated-f64 lo words do; the
    # framework prescales to O(1) everywhere, see CLAUDE.md.)
    n = 256
    A = rng.standard_normal((n, n)) * np.logspace(-8, 8, n)[:, None]
    B = rng.standard_normal((n, n)) * np.logspace(8, -8, n)[None, :]
    _check(A, B, 5e-14)


def test_padding(interpreted, rng):
    _check(rng.standard_normal((100, 200)), rng.standard_normal((200, 300)),
           5e-14)
