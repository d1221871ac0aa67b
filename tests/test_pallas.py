"""Pallas fused Cauchy-matmul kernel, run in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl

import symmetric_eigenvalue_tpu.kernels.pallas.cauchy_matmul as cm


@pytest.fixture
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(cm.pl, "pallas_call", patched)


@pytest.mark.parametrize("prec,tol", [("highest", 1e-5), ("bf16_3x", 5e-4)])
def test_cauchy_matmul_interpret(interpreted, rng, monkeypatch, prec, tol):
    monkeypatch.setenv("SE_DOWNSWEEP_PRECISION", prec)
    m, C = 256, 256
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    tau[7] = 1e-13                      # near-pole root: needs pair arithmetic
    shift_val = poles.copy()
    zhat = rng.standard_normal(m) * 0.1
    ncolinv = np.abs(rng.standard_normal(m)) + 0.1
    X = rng.standard_normal((m, C)).astype(np.float32)
    Y = np.asarray(cm.cauchy_matmul(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(zhat), jnp.asarray(ncolinv), jnp.asarray(X),
        tj=128, ti=128, tc=128))
    den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
    M = (zhat[:, None] / den) * ncolinv[None, :]
    Yref = M @ X.astype(np.float64)
    rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
    assert rel < tol


def test_split_f64_roundtrip(rng):
    v = jnp.asarray(rng.standard_normal(100) * 1e3)
    hi, lo = cm.split_f64(v)
    assert hi.dtype == jnp.float32 and lo.dtype == jnp.float32
    err = np.abs(np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
                 - np.asarray(v))
    assert err.max() < 1e-10


def test_supported_predicate():
    assert cm.supported(2048, 4096)
    assert not cm.supported(100, 4096)
    assert not cm.supported(2048, 100)


def test_cauchy_matmul_small_m(interpreted, rng, monkeypatch):
    # deep-tree levels: m < 512 runs with full-m tiles (no XLA fallback)
    monkeypatch.setenv("SE_DOWNSWEEP_PRECISION", "highest")
    m, C = 64, 512
    poles = np.sort(rng.standard_normal(m))
    tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
    shift_val = poles.copy()
    zhat = rng.standard_normal(m) * 0.1
    ncolinv = np.abs(rng.standard_normal(m)) + 0.1
    X = rng.standard_normal((m, C)).astype(np.float32)
    Y = np.asarray(cm.cauchy_matmul(
        jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
        jnp.asarray(zhat), jnp.asarray(ncolinv), jnp.asarray(X)))
    den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
    M = (zhat[:, None] / den) * ncolinv[None, :]
    Yref = M @ X.astype(np.float64)
    rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
    assert cm.supported(m, C)
    assert rel < 1e-5


def test_cauchy_rowsum_interpret(rng):
    import symmetric_eigenvalue_tpu.kernels.pallas.cauchy_rowsum as crs
    from jax.experimental import pallas as _pl
    orig = _pl.pallas_call
    crs.pl.pallas_call = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        for m in (64, 512):
            poles = np.sort(rng.standard_normal(m))
            tau = np.abs(rng.standard_normal(m)) * 1e-3 + 1e-15
            tau[m // 3] = 1e-13           # near-pole root
            shift_val = poles.copy()
            wz = rng.standard_normal((2, m)) * 0.2
            S = np.asarray(crs.cauchy_rowsum(
                jnp.asarray(poles), jnp.asarray(shift_val), jnp.asarray(tau),
                jnp.asarray(wz)))
            den = (poles[:, None] - shift_val[None, :]) - tau[None, :]
            ref = wz @ (1.0 / den)
            # f64-grade: the sums feed the next level's z-vector
            rel = np.abs(S - ref).max() / np.abs(ref).max()
            assert rel < 1e-13, (m, rel)
            assert crs.supported(m, 2)
    finally:
        crs.pl.pallas_call = orig
