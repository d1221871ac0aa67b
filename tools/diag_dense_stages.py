"""Isolate the q9b dense two-stage TPU device fault stage by stage.

Runs each phase of driver._compiled_eigh(band>0) as its OWN dispatch with a
sync between: reduce_to_band -> band_to_tridiag_wave -> tridiagonal solve ->
apply_q2_wave_blocked -> apply_q.  Whichever stage faults the device
("UNAVAILABLE: TPU device error") names the kernel to fix.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/diag_dense_stages.py [n] [band]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def stage(name, fn, *args):
    # utils.timing.sync, NOT jax.block_until_ready: on the tunneled axon
    # platform block_until_ready returns before execution finishes, so the
    # q10a run printed five "ok" stages and faulted only at the final full
    # fetch — the one-leaf host fetch actually waits (CLAUDE.md).
    from symmetric_eigenvalue_tpu.utils.timing import sync
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    print(f"  [{name}] ok in {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    band = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f"diag_dense_stages n={n} band={band} "
          f"platform={jax.default_backend()}", flush=True)

    from symmetric_eigenvalue_tpu import config as cfg
    from symmetric_eigenvalue_tpu.core.tree import build_plan
    from symmetric_eigenvalue_tpu.driver import _solve
    from symmetric_eigenvalue_tpu.kernels.band_reduce import (
        apply_q2_wave_blocked, band_to_tridiag_wave, reduce_to_band)
    from symmetric_eigenvalue_tpu.kernels.tridiagonalize import apply_q

    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, n))
    A = (A + A.T) / (2.0 * np.sqrt(n))
    Adev = jnp.asarray(A)

    buckets = 4 if n >= 8192 else 1
    B, Yt, taus = stage(
        "reduce_to_band",
        jax.jit(lambda A: reduce_to_band(A, band, buckets=buckets,
                                         want_reflectors=True)), Adev)
    d, e, vlog = stage(
        "band_to_tridiag_wave",
        jax.jit(lambda B: band_to_tridiag_wave(B, band, want_log=True)), B)

    config = cfg.DEFAULT_CONFIG
    plan = build_plan(n, config.resolved_leaf_size(n), config.max_leaves)
    lam, W = stage(
        "tridiag_solve",
        jax.jit(lambda d, e: _solve(d, e, None, plan, config,
                                    want_vectors=True, mesh=None)), d, e)
    W = stage(
        "apply_q2_wave_blocked",
        jax.jit(lambda vlog, W: apply_q2_wave_blocked(n, band, vlog, W)),
        vlog, W)
    X = stage(
        "apply_q",
        jax.jit(lambda Yt, taus, W: apply_q(Yt, taus, W, panel=band)),
        Yt, taus, W)

    # quick correctness check (host, f64)
    Xh = np.asarray(X)
    lamh = np.asarray(lam)
    resid = np.abs(A @ Xh - Xh * lamh[None, :]).max()
    orth = np.abs(Xh.T @ Xh - np.eye(n)).max()
    print(f"  residual {resid:.3e} (/||A|| {resid / np.abs(lamh).max():.3e}) "
          f"orth {orth:.3e}", flush=True)
    print("DIAG_DENSE_OK", flush=True)


if __name__ == "__main__":
    main()
