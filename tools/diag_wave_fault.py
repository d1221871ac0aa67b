#!/usr/bin/env python
"""Bisect the band_to_tridiag_wave TPU device fault (round-5, q8a stage 2).

Runs the wave chase at increasing n with want_log False/True, syncing after
each, to separate the P window scatter from the reflector-log scatter and
find the size threshold.

Usage: PYTHONPATH=.:/root/.axon_site python tools/diag_wave_fault.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from symmetric_eigenvalue_tpu.kernels.band_reduce import band_to_tridiag_wave
from symmetric_eigenvalue_tpu.utils.timing import sync


def run(n, b, want_log):
    rng = np.random.default_rng(0)
    B = np.zeros((n, n))
    for k in range(b + 1):
        v = rng.standard_normal(n - k)
        B += np.diag(v, k) + (np.diag(v, -k) if k else 0)
    Bj = jnp.asarray(B)
    t0 = time.perf_counter()
    fn = jax.jit(lambda B: band_to_tridiag_wave(B, b, want_log=want_log))
    d, e, (Vw, tw) = fn(Bj)
    sync((d, e))
    t1 = time.perf_counter()
    # eigenvalue agreement check (host, cheap at these n)
    from scipy.linalg import eigh_tridiagonal, eigvalsh
    w_ref = eigvalsh(B)
    w_new = eigh_tridiagonal(np.asarray(d), np.asarray(e), eigvals_only=True)
    err = np.abs(w_ref - w_new).max() / max(np.abs(w_ref).max(), 1e-30)
    print(f"  n={n} b={b} want_log={want_log}: ok in {t1 - t0:.1f}s "
          f"eig err={err:.2e}", flush=True)


if __name__ == "__main__":
    print(f"platform={jax.default_backend()}", flush=True)
    for n, b, wl in ((1024, 128, False), (1024, 128, True),
                     (2048, 128, False), (2048, 128, True),
                     (4096, 128, False), (4096, 128, True)):
        run(n, b, wl)
    print("ALL OK", flush=True)
