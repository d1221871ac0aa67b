"""Pallas secular-sums kernel (interpreter mode) + kernel-vs-XLA root parity.

The kernel carries the root finder's per-iteration reductions
(ref: secularEquation, eigenvalues.c:8-17, inside the bisection loop
eigenvalues.c:161-247).  Real-hardware numbers: tools/check_pallas_on_tpu.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import symmetric_eigenvalue_tpu.kernels.pallas.secular_sums as ss


@pytest.fixture
def interpreted(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ss.pl, "pallas_call", patched)


def _quantize_pair(v):
    """Round f64 to its f32-pair representation: on TPU (emulated f64) the
    inputs natively ARE pairs, so the oracle must live on the same grid."""
    hi = v.astype(np.float32).astype(np.float64)
    lo = (v - hi).astype(np.float32).astype(np.float64)
    return hi + lo


def test_secular_sums_interpret(interpreted, rng):
    m, B = 128, 32
    poles = _quantize_pair(np.sort(rng.standard_normal(m)))
    z2 = _quantize_pair((rng.standard_normal(m) * 0.1) ** 2)
    sl = np.arange(B).astype(np.int32)
    shift_val = poles[sl]
    tau = _quantize_pair(1e-3 * rng.random(B) + 1e-14)
    tau[5] = 1e-13                      # near-pole root: needs pair arithmetic
    S1, S2, S1L, S2L = ss.secular_sums(
        jnp.asarray(poles), jnp.asarray(z2), jnp.asarray(shift_val),
        jnp.asarray(tau), jnp.asarray(sl), ti=32, tj=64)
    dif = (poles[None, :] - shift_val[:, None]) - tau[:, None]
    t1 = z2[None, :] / dif
    t2 = t1 / dif
    mask = np.arange(m)[None, :] <= sl[:, None]
    sc1 = np.maximum(np.abs(t1.sum(1)), np.abs(t1).max(1))
    sc2 = np.maximum(np.abs(t2.sum(1)), np.abs(t2).max(1))
    # S1/S1L carry the convergence test: double-word accuracy required
    assert (np.abs(np.asarray(S1) - t1.sum(1)) / sc1).max() < 1e-12
    assert (np.abs(np.asarray(S1L) - (t1 * mask).sum(1)) / sc1).max() < 1e-12
    # S2/S2L only steer the Newton step: f32-with-compensation is enough
    assert (np.abs(np.asarray(S2) - t2.sum(1)) / sc2).max() < 1e-5
    assert (np.abs(np.asarray(S2L) - (t2 * mask).sum(1)) / sc2).max() < 1e-5


def test_supported_shapes():
    assert ss.supported(16384, 2048)
    assert ss.supported(1024, 1024)
    assert ss.supported(512, 8)
    assert not ss.supported(16384, 12)       # block not 8-divisible
    assert not ss.supported(100, 256)        # m not tileable
