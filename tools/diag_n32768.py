"""n=32768 full-eigenpair run with UNFILTERED tracebacks.

bench.py truncates config failures to a 300-char repr (the round-3 headline
burial fix), which hides WHERE the current RESOURCE_EXHAUSTED comes from.
This runs the same staged solve directly and lets the full exception (and
any XLA OOM allocation dump) reach the log, with per-phase prints so the
failing dispatch is bracketed even when the error text is opaque.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       JAX_TRACEBACK_FILTERING=off python tools/diag_n32768.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
os.environ.setdefault("SE_PROFILE_BACKTRANSFORM", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    print(f"diag_n32768 n={n} platform={jax.default_backend()}", flush=True)

    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged

    rng = np.random.default_rng(2024)
    d = jnp.asarray(rng.standard_normal(n))
    e = jnp.asarray(rng.standard_normal(n - 1))

    t0 = time.perf_counter()
    res, timer = solve_tridiagonal_staged(d, e, compute_vectors=True)
    jax.block_until_ready(res.eigenvectors)
    print(f"solve ok in {time.perf_counter() - t0:.1f}s "
          f"phases={ {k: round(v, 3) for k, v in timer.times.items()} }",
          flush=True)

    lam = np.asarray(res.eigenvalues)
    V = res.eigenvectors
    # residual check in manageable column chunks on device
    norm_t = float(np.abs(lam).max())
    worst = 0.0
    dv = jnp.asarray(d)
    ev = jnp.asarray(e)

    @jax.jit
    def resid_chunk(Vc, lamc):
        Tv = dv[:, None] * Vc
        Tv = Tv.at[:-1].add(ev[:, None] * Vc[1:])
        Tv = Tv.at[1:].add(ev[:, None] * Vc[:-1])
        return jnp.max(jnp.abs(Tv - Vc * lamc[None, :]))

    for o in range(0, n, 4096):
        w = min(4096, n - o)
        worst = max(worst, float(resid_chunk(V[:, o:o + w],
                                             jnp.asarray(lam[o:o + w]))))
    print(f"max residual {worst:.3e} (= {worst / norm_t:.3e} * ||T||)",
          flush=True)
    print("DIAG_32768_OK", flush=True)


if __name__ == "__main__":
    main()
