#!/usr/bin/env python
"""Clustered n=4096: staged path vs the single-jit library path.

The staged path (bench default) spends its wall on dispatch/fetch latency
(see TRACE_DISPATCH.json); at n <= single_jit_max the library entry point
``solve_tridiagonal`` runs the WHOLE solve as one jit — this probe measures
whether it reaches the 0.45 s BASELINE bar with the same accuracy.

Usage: PYTHONPATH=.:/root/.axon_site python tools/clustered_singlejit_probe.py [n]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu.core.tridiag import residual_norms  # noqa: E402
from symmetric_eigenvalue_tpu.driver import (  # noqa: E402
    solve_tridiagonal, solve_tridiagonal_staged)
from symmetric_eigenvalue_tpu.utils.checks import max_ortho_error  # noqa: E402
from symmetric_eigenvalue_tpu.utils.timing import sync  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal(max(N // 64, 1)) * 10
    d_np = np.repeat(centers, 64)[:N] + 1e-9 * rng.standard_normal(N)
    e_np = 1e-7 * (1.0 + rng.random(N - 1))
    d = jnp.asarray(d_np)
    e = jnp.asarray(e_np)
    cfg = SolverConfig()
    norm_t = float(np.abs(d_np).max() + 2 * np.abs(e_np).max())
    out = {"n": N, "backend": jax.default_backend(), "norm_t": norm_t}

    for name, run in (
        ("single_jit", lambda: solve_tridiagonal(
            d, e, config=cfg, compute_vectors=True)),
        ("staged", lambda: solve_tridiagonal_staged(
            d, e, config=cfg, compute_vectors=True)[0]),
    ):
        res = run()
        sync(res)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            sync(res)
            times.append(time.perf_counter() - t0)
        lam, V = res.eigenvalues, res.eigenvectors
        rel = float(jax.jit(lambda d, e, lam, V: jnp.max(
            residual_norms(d, e, lam, V)))(d, e, lam, V)) / norm_t
        orth = max_ortho_error(V)
        out[name] = {"best_s": round(min(times), 4),
                     "times": [round(t, 4) for t in times],
                     "max_residual_over_normT": float(f"{rel:.3e}"),
                     "max_orthogonality_error": float(f"{orth:.3e}")}
        print(name, out[name], flush=True)

    with open(os.path.join(_HERE, "CLUSTERED_SINGLEJIT.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote CLUSTERED_SINGLEJIT.json", flush=True)


if __name__ == "__main__":
    main()
