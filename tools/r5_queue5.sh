#!/bin/bash
# Round-5 TPU queue 5 (FINAL): authoritative full bench (headline +
# extras: Pallas validation, clustered, poisson, n=65536 eigenvalues,
# n=32768 streamed full eigenpairs) with the round-5 code, which also
# rewarms .jax_cache for the driver's end-of-round bench run.
set -u
cd /root/repo
export PYTHONPATH=.:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== q5: full bench + extras (round-5 authoritative) ==="
BENCH_REPS=3 BENCH_BUDGET=4200 timeout 7200 python bench.py 2>&1 | tail -40
echo "q5 exit=$?"

echo "=== q5b: warm second headline run (cache sanity for the driver) ==="
BENCH_EXTRA=0 BENCH_REPS=2 timeout 1800 python bench.py 2>&1 | tail -4
echo "q5b exit=$?"
echo "=== queue5 done ==="
