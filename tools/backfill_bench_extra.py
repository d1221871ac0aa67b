#!/usr/bin/env python
"""Backfill one BASELINE.md config into BENCH_EXTRA.json.

Used when a transient failure (e.g. the tunneled TPU's remote-compile
endpoint dropping a response) cost one extras config its artifact: rerun just
that config and merge the result into the existing BENCH_EXTRA.json, clearing
any recorded error for it.  Usage:

    PYTHONPATH=.:/root/.axon_site python tools/backfill_bench_extra.py \
        65536 random 0 [reps]
"""
import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import bench  # noqa: E402


def main():
    n = int(sys.argv[1])
    matrix = sys.argv[2]
    vectors = sys.argv[3] not in ("0", "false", "False")
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    r = bench.run_config(n, bench.SEED, matrix, vectors, reps)

    results = {"headline_metric": "wallclock_full_eigenpairs_n16384",
               "host": bench._host_key(), "configs": []}
    if os.path.exists(bench.EXTRA_PATH):
        with open(bench.EXTRA_PATH) as f:
            results = json.load(f)
    results["configs"] = [c for c in results.get("configs", [])
                          if c.get("metric") != r["metric"]] + [r]
    cfg_key = f"n{n}_{matrix}"
    if "errors" in results:
        results["errors"] = [e for e in results["errors"]
                             if e.get("config") != cfg_key]
        if not results["errors"]:
            del results["errors"]
    with open(bench.EXTRA_PATH, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
