"""Pallas double-word matvec kernel, run in interpreter mode on CPU.

The on-TPU counterpart (compiled kernel vs the XLA emulated-f64 path at
bench shapes) runs from bench.py / tools recorded in PARITY.md — interpreter
mode validates the double-word arithmetic itself at f64-grade tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

import symmetric_eigenvalue_tpu.kernels.pallas.dword_matvec as dm
from symmetric_eigenvalue_tpu.kernels.pallas.cauchy_matmul import split_f64


@pytest.fixture
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(dm.pl, "pallas_call", patched)


def test_dword_vecmat_interpret(interpreted, rng):
    n, m = 512, 512
    A = rng.standard_normal((n, m))
    v = rng.standard_normal(n)
    Ah, Al = split_f64(jnp.asarray(A))
    y = np.asarray(dm.dword_vecmat(jnp.asarray(v), Ah, Al, ti=256, tj=512))
    ref = np.asarray(v, np.longdouble) @ np.asarray(A, np.longdouble)
    rel = np.abs(y - np.asarray(ref, np.float64)).max() / np.abs(ref).max()
    # double-word accumulation: ~2^-48-grade, far beyond f32's 6e-8
    assert rel < 1e-13


def test_dword_vecmat_cancellation(interpreted, rng):
    # adversarial cancellation: entries paired to nearly cancel, so the
    # result is ~1e-8 times smaller than the terms; plain f32 would lose all
    # significant digits, the compensated channels must keep ~5 of them
    n, m = 512, 512
    A = rng.standard_normal((n // 2, m))
    A = np.concatenate([A, -A * (1.0 + 1e-8)], axis=0)
    v = np.concatenate([np.ones(n // 2), np.ones(n // 2)])
    Ah, Al = split_f64(jnp.asarray(A))
    y = np.asarray(dm.dword_vecmat(jnp.asarray(v), Ah, Al, ti=256, tj=512))
    ref = np.asarray(v, np.longdouble) @ np.asarray(A, np.longdouble)
    denom = np.abs(np.asarray(A, np.float64)).sum(axis=0).max()
    rel = np.abs(y - np.asarray(ref, np.float64)).max() / denom
    assert rel < 1e-13


def test_supported_predicate():
    assert dm.supported(512, 1024)
    assert not dm.supported(100, 512)
    assert not dm.supported(512, 100)
