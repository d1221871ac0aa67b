#!/usr/bin/env python
"""On-TPU A/B check: apply_q2_wave_blocked with per-slot dword GEMMs
(SE_Q2_DWORD=1, the TPU default) vs the XLA einsum path (SE_Q2_DWORD=0).

Bit-agreement is not expected (different summation orders); both are
f64-grade, so the difference must sit at ~1e-13 of the operand scale.
Also times both: the einsum path is the ~390 s emulated-f64 wall at
n=16384 (PLAN_SBR2.md), the dword path should be ~20x cheaper.

Usage: PYTHONPATH=.:/root/.axon_site python tools/check_q2_dword.py [n] [C]
"""
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
B = int(os.environ.get("DENSE_BAND", "128"))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from symmetric_eigenvalue_tpu.kernels import band_reduce as br  # noqa: E402
from symmetric_eigenvalue_tpu.utils.timing import sync  # noqa: E402


def main():
    print(f"check_q2_dword n={N} C={C} band={B} "
          f"platform={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    Aband = np.zeros((N, N))
    for k in range(B + 1):
        v = rng.standard_normal(N - k) / np.sqrt(N)
        Aband[np.arange(N - k), np.arange(k, N)] = v
        Aband[np.arange(k, N), np.arange(N - k)] = v
    X = jnp.asarray(rng.standard_normal((N, C)) / np.sqrt(N))

    d, e, vlog = jax.jit(
        lambda A: br.band_to_tridiag_wave(A, B, want_log=True))(
            jnp.asarray(Aband))
    sync((d, e))

    outs = {}
    for mode in ("0", "1"):
        os.environ["SE_Q2_DWORD"] = mode
        fn = jax.jit(lambda vlog, X: br.apply_q2_wave_blocked(N, B, vlog, X))
        t0 = time.perf_counter()
        Y = sync(fn(vlog, X))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        Y = sync(fn(vlog, X))
        tw = time.perf_counter() - t0
        outs[mode] = (np.asarray(Y), tc, tw)
        print(f"  SE_Q2_DWORD={mode}: compile+run {tc:.1f}s warm {tw:.3f}s",
              flush=True)
        jax.clear_caches()

    diff = np.abs(outs["0"][0] - outs["1"][0]).max()
    scale = np.abs(outs["0"][0]).max()
    rel = diff / scale
    ok = rel < 1e-11
    print(f"max|einsum-dword|={diff:.3e} scale={scale:.3e} rel={rel:.3e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
