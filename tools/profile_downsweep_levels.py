#!/usr/bin/env python
"""Per-LEVEL wall profile of the real staged downsweep at the headline size.

DOWNSWEEP_KERNEL.json times the isolated cauchy_matmul shapes; this times
the actual per-level dispatches (root assemble, each apply_u_level step,
leaf einsum) with a sync between — separating the deep-level tail
(VERDICT r4 item 6) into its matmul and rotation-replay parts is then a
matter of comparing against the kernel microbench.

Usage: PYTHONPATH=.:/root/.axon_site python tools/profile_downsweep_levels.py \
           [n] [matrix]
Writes DOWNSWEEP_LEVELS.json.
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
MATRIX = sys.argv[2] if len(sys.argv) > 2 else "random"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu import driver  # noqa: E402
from symmetric_eigenvalue_tpu.utils.timing import sync  # noqa: E402


def matrix(n):
    rng = np.random.default_rng(0)
    if MATRIX == "clustered":
        centers = rng.standard_normal(max(n // 64, 1)) * 10
        d = np.repeat(centers, 64)[:n] + 1e-9 * rng.standard_normal(n)
        return d, 1e-7 * (1.0 + rng.random(n - 1))
    if MATRIX == "poisson":
        return 2.0 * np.ones(n), -np.ones(n - 1)
    return rng.standard_normal(n) * 5.0, rng.standard_normal(n - 1) * 2.0


def main():
    print(f"profile_downsweep_levels n={N} matrix={MATRIX} "
          f"platform={jax.default_backend()}", flush=True)
    d_np, e_np = matrix(N)
    cfg = SolverConfig()
    fn, plan, leaf_only = driver._compiled_upsweep(N, cfg, None)
    assert not leaf_only
    reps, lam, lam_flat, Q, d, e = fn(jnp.asarray(d_np), jnp.asarray(e_np))
    sync(lam)

    sel = jnp.arange(N)
    C = N
    chunk = max(1, cfg.vec_chunk)
    # m_fold=0: per-level dispatches so each level is separately timeable
    plan2, root_fn, level_fns, leaf_fn, _deep = driver._compiled_downsweep_steps(
        N, cfg, min(chunk, C), None, 0)
    top = jax.tree.map(lambda a: a[0], reps[-1])

    def run_profiled(record):
        stats = {}
        parts = []
        for o in range(0, C, chunk):
            sel_c = sel[o:o + chunk]
            t0 = time.perf_counter()
            X = root_fn(top, sel_c)
            if record:
                sync(X)
                stats["root"] = stats.get("root", 0.0) + \
                    time.perf_counter() - t0
            for li in range(plan2.num_levels - 2, -1, -1):
                t0 = time.perf_counter()
                X = level_fns[li](reps[li], X)
                if record:
                    sync(X)
                    key = f"level_m{plan2.levels[li].merge_size}"
                    stats[key] = stats.get(key, 0.0) + \
                        time.perf_counter() - t0
            t0 = time.perf_counter()
            X = leaf_fn(Q, X)
            if record:
                sync(X)
                stats["leaf"] = stats.get("leaf", 0.0) + \
                    time.perf_counter() - t0
            parts.append(X)
        X = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        sync(X)
        return stats

    run_profiled(False)               # compile
    t0 = time.perf_counter()
    run_profiled(False)
    unsynced = time.perf_counter() - t0   # true async wall
    stats = run_profiled(True)            # per-level walls (syncs serialize)

    n_chunks = (C + chunk - 1) // chunk
    out = {"n": N, "matrix": MATRIX, "backend": jax.default_backend(),
           "vec_chunk": chunk, "n_chunks": n_chunks,
           "downsweep_async_wall_s": round(unsynced, 4),
           "per_level_synced_s": {k: round(v, 4)
                                  for k, v in stats.items()}}
    print(json.dumps(out, indent=1), flush=True)
    with open(os.path.join(_HERE, "DOWNSWEEP_LEVELS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote DOWNSWEEP_LEVELS.json", flush=True)


if __name__ == "__main__":
    main()
