#!/usr/bin/env python
"""Benchmark: full eigenpairs of a random symmetric tridiagonal matrix.

Headline config (BASELINE.md): n=16384, all eigenvalues + all eigenvectors,
max residual ||T v - lam v|| <= 1e-12 * ||T||.

Baseline: LAPACK ``dstevd`` (divide-and-conquer, the exact serial algorithm the
reference parallelizes over MPI) via scipy on the host CPU.  The reference
itself publishes no numbers (BASELINE.md) and needs a 16-node MPI cluster; the
serial LAPACK D&C is the honest reproducible stand-in.  The baseline timing is
cached in BENCH_BASELINE_CACHE.json (host CPU timing is stable between runs).

Prints ONE JSON line:
  {"metric": ..., "value": <our seconds>, "unit": "s", "vs_baseline": <x faster>}
"""

import json
import os
import sys
import time

N = int(os.environ.get("BENCH_N", "16384"))
SEED = int(os.environ.get("BENCH_SEED", "0"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
# BASELINE.md configs: random (headline), clustered (n=4096 deflation stress),
# poisson (scheme 2, analytic-spectrum check)
MATRIX = os.environ.get("BENCH_MATRIX", "random")
VECTORS = os.environ.get("BENCH_VECTORS", "1") != "0"
MIXED = os.environ.get("BENCH_MIXED", "1") == "1"
VEC_CHUNK = int(os.environ.get("BENCH_VEC_CHUNK", "0"))
CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_BASELINE_CACHE.json")


def make_matrix(n, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    if MATRIX == "random":
        return rng.standard_normal(n) * 5.0, rng.standard_normal(n - 1) * 2.0
    if MATRIX == "clustered":
        # tight eigenvalue clusters -> heavy deflation in every merge
        centers = rng.standard_normal(max(n // 64, 1)) * 10
        d = np.repeat(centers, 64)[:n]
        d = d + 1e-9 * rng.standard_normal(n)
        e = 1e-7 * (1.0 + rng.random(n - 1))
        return d, e
    if MATRIX == "poisson":
        return 2.0 * np.ones(n), -np.ones(n - 1)
    raise SystemExit(f"unknown BENCH_MATRIX={MATRIX}")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _host_key():
    """CPU identity for the baseline cache: dstevd timings from one machine
    must not masquerade as the baseline on another."""
    import platform
    cpu = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return f"{platform.node()}|{cpu}"


def baseline_seconds(d, e):
    key = f"stevd_n{N}_seed{SEED}_{MATRIX}" + ("" if VECTORS else "_novec")
    cache = {}
    if os.path.exists(CACHE_PATH):
        try:
            with open(CACHE_PATH) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if cache.get("__host__") != _host_key():
        if cache:
            log("baseline cache is from a different host; re-measuring")
        cache = {"__host__": _host_key()}
    if key in cache:
        log(f"baseline (cached): {cache[key]:.2f}s")
        return cache[key]
    import numpy as np
    from scipy.linalg import eigh_tridiagonal
    log("running LAPACK dstevd baseline on host CPU ...")
    t0 = time.perf_counter()
    if VECTORS:
        w, _ = eigh_tridiagonal(d, e, lapack_driver="stevd")
    else:
        w = eigh_tridiagonal(d, e, eigvals_only=True, lapack_driver="stev")
    dt = time.perf_counter() - t0
    log(f"baseline dstevd: {dt:.2f}s  (lam[0]={w[0]:.6g})")
    cache[key] = dt
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception:
        pass
    return dt


def main():
    import numpy as np

    d_np, e_np = make_matrix(N, SEED)

    base_s = baseline_seconds(d_np, e_np)

    import jax
    jax.config.update("jax_enable_x64", True)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import symmetric_eigenvalue_tpu as se
    from symmetric_eigenvalue_tpu.core.tree import build_plan
    from symmetric_eigenvalue_tpu.core.tridiag import residual_norms
    from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged

    log(f"backend: {jax.default_backend()}  devices: {len(jax.devices())}  n={N}")
    kw = {"mixed_precision_vectors": MIXED}
    if VEC_CHUNK:
        kw["vec_chunk"] = VEC_CHUNK
    cfg = se.SolverConfig(**kw)
    plan = build_plan(N, cfg.resolved_leaf_size(N), cfg.max_leaves)
    log(f"plan: P={plan.num_leaves} L={plan.num_levels} b={plan.leaf_pad}")

    d = jnp.asarray(d_np)
    e = jnp.asarray(e_np)

    from symmetric_eigenvalue_tpu.utils.timing import sync

    def run():
        res, timer = solve_tridiagonal_staged(
            d, e, config=cfg, compute_vectors=VECTORS)
        sync(res)
        return res, timer

    t0 = time.perf_counter()
    res, timer = run()
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s")

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        res, timer = run()
        times.append(time.perf_counter() - t0)
        log("  phases: " + ", ".join(f"{k}={v:.2f}s"
                                     for k, v in timer.times.items()))
    lam, V = res.eigenvalues, res.eigenvectors
    ours = min(times)
    log(f"runs: {[f'{t:.2f}' for t in times]}")

    # accuracy self-check on device (ref filehandling.c:511-537)
    norm_t = float(np.abs(d_np).max() + 2 * np.abs(e_np).max())
    if VECTORS:
        res = float(jax.jit(
            lambda d, e, lam, V: jnp.max(residual_norms(d, e, lam, V)))(
                d, e, lam, V))
        rel = res / norm_t
        log(f"max residual: {res:.3e}  (= {rel:.3e} * ||T||)")
    else:
        from scipy.linalg import eigh_tridiagonal
        wref = eigh_tridiagonal(d_np, e_np, eigvals_only=True,
                                lapack_driver="stev")
        rel = float(np.abs(np.asarray(lam) - wref).max()) / norm_t
        log(f"max |dlam|/||T||: {rel:.3e}")

    what = "eigenpairs" if VECTORS else "eigenvalues"
    mat = "" if MATRIX == "random" else f"_{MATRIX}"
    out = {
        "metric": f"wallclock_full_{what}_n{N}{mat}",
        "value": round(ours, 4),
        "unit": "s",
        "vs_baseline": round(base_s / ours, 3),
        "baseline_s": round(base_s, 3),
        "baseline_def": "LAPACK dstevd (scipy eigh_tridiagonal) host CPU",
        # in eigenvalues-only mode `rel` is an eigenvalue error vs LAPACK, not
        # a residual — name the field accordingly
        ("max_residual_over_normT" if VECTORS
         else "max_eigenvalue_error_over_normT"): float(f"{rel:.3e}"),
        ("residual_target_met" if VECTORS
         else "eigenvalue_error_below_1e12_normT"): bool(rel <= 1e-12),
        "backend": jax.default_backend(),
        "mixed_precision": MIXED,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
