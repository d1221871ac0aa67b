#!/bin/bash
# Round-5 TPU queue 1: n=32768 full eigenpairs (VERDICT 2), clustered
# dispatch trace (VERDICT 4), Poisson BT sub-phase profile (VERDICT 5),
# downsweep per-level profile (VERDICT 6).
# Serialized: the tunneled chip is single-process.
set -u
cd /root/repo
export PYTHONPATH=.:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== q1a: n=32768 full eigenpairs (grouped downsweep+refine) ==="
BENCH_N=32768 BENCH_MATRIX=random BENCH_VECTORS=1 BENCH_REPS=1 \
  BENCH_BASELINE_CAP=1 \
  timeout 5400 python bench.py 2>&1 | tail -30
echo "q1a exit=$?"

echo "=== q1b: dispatch trace, clustered n=4096 ==="
timeout 3600 python tools/trace_dispatches.py 4096 clustered 2>&1 | tail -150
echo "q1b exit=$?"

echo "=== q1c: Poisson n=16384 BT sub-phase profile ==="
SE_PROFILE_BACKTRANSFORM=1 BENCH_N=16384 BENCH_MATRIX=poisson \
  BENCH_VECTORS=1 BENCH_REPS=1 BENCH_BASELINE_CAP=1 \
  timeout 5400 python bench.py 2>&1 | tail -60
echo "q1c exit=$?"

echo "=== q1d: downsweep per-level profile n=16384 ==="
timeout 3600 python tools/profile_downsweep_levels.py 16384 random 2>&1 | tail -30
echo "q1d exit=$?"
echo "=== queue1 done ==="
