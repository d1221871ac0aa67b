#!/usr/bin/env python
"""Leaf-size retune at the headline config (VERDICT r2 item 8 follow-up).

Round-robin parallel Jacobi made bigger leaves cheap; sweep leaf_size at
n=16384 (and optionally other n via argv) on the real TPU, recording phase
times per leaf size to LEAF_RETUNE.json.  The P=2048 device-fault cap
(config.resolved_leaf_size) is unaffected: all probed plans stay P <= 1024.

Usage: PYTHONPATH=.:/root/.axon_site python tools/leaf_retune.py [n] [leaves…]
"""
import json
import os
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
LEAVES = [int(a) for a in sys.argv[2:]] or [32, 64, 128]
# LEAF_RETUNE_VECTORS=0: eigenvalues-only sweep (the n=65536 flagship config;
# full vectors at that size exceed one chip)
VECTORS = os.environ.get("LEAF_RETUNE_VECTORS", "1") == "1"

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from symmetric_eigenvalue_tpu import SolverConfig  # noqa: E402
from symmetric_eigenvalue_tpu.core.tree import build_plan  # noqa: E402
from symmetric_eigenvalue_tpu.core.tridiag import residual_norms  # noqa: E402
from symmetric_eigenvalue_tpu.driver import solve_tridiagonal_staged  # noqa: E402
from symmetric_eigenvalue_tpu.utils.timing import sync  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    d_np = rng.standard_normal(N) * 5.0
    e_np = rng.standard_normal(N - 1) * 2.0
    d = jnp.asarray(d_np)
    e = jnp.asarray(e_np)
    norm_t = float(np.abs(d_np).max() + 2 * np.abs(e_np).max())

    results = {"n": N, "backend": jax.default_backend(),
               "vectors": VECTORS, "leaves": {}}
    out_path = os.path.join(
        _HERE, "LEAF_RETUNE.json" if N == 16384 and VECTORS
        else f"LEAF_RETUNE_{N}{'' if VECTORS else '_novec'}.json")
    for leaf in LEAVES:
        cfg = SolverConfig(leaf_size=leaf, mixed_precision_vectors=True)
        plan = build_plan(N, cfg.resolved_leaf_size(N), cfg.max_leaves)
        print(f"leaf={leaf}: P={plan.num_leaves} L={plan.num_levels} "
              f"b={plan.leaf_pad}", flush=True)
        try:
            t0 = time.perf_counter()
            res, timer = solve_tridiagonal_staged(
                d, e, config=cfg, compute_vectors=VECTORS)
            sync(res)
            first = time.perf_counter() - t0
            times = []
            phases = {}
            for _ in range(2):
                t0 = time.perf_counter()
                res, timer = solve_tridiagonal_staged(
                    d, e, config=cfg, compute_vectors=VECTORS)
                sync(res)
                times.append(time.perf_counter() - t0)
                phases = {k: round(v, 3) for k, v in timer.times.items()}
            rel = float(jax.jit(
                lambda d, e, lam, V: jnp.max(residual_norms(d, e, lam, V)))(
                    d, e, res.eigenvalues, res.eigenvectors)) / norm_t \
                if VECTORS else None
            entry = {"P": plan.num_leaves, "levels": plan.num_levels,
                     "best_s": round(min(times), 3), "first_s": round(first, 1),
                     "phases_s": phases,
                     "max_residual_over_normT":
                         float(f"{rel:.3e}") if rel is not None else None}
            print(f"  best {min(times):.3f}s phases {phases} "
                  f"rel {rel}", flush=True)
        except Exception as exc:  # noqa: BLE001 — probe; record and continue
            entry = {"error": repr(exc)}
            print(f"  FAILED: {exc!r}", flush=True)
        results["leaves"][str(leaf)] = entry
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
