#!/bin/bash
# Round-5 TPU queue 3: validate the new kernels (U-materialize, deflation
# skip), dense two-stage sanity with the dus chase fix, then fresh
# n=16384 random/poisson and n=4096 clustered benches measuring the
# deflation-skip + level-batched-replay commits.
set -u
cd /root/repo
export PYTHONPATH=.:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== q3v: kernel validation (U-materialize + deflation-skip entries) ==="
timeout 2400 python tools/check_pallas_on_tpu.py 2>&1 | tail -18
VEXIT=$?
echo "q3v exit=$VEXIT"
if [ "$VEXIT" -eq 0 ]; then
  export SE_ROOT_MATERIALIZE=1
  echo "(validation green: benches run with SE_ROOT_MATERIALIZE=1)"
fi

echo "=== q3a: dense two-stage sanity n=4096 band=128 (dus chase) ==="
DENSE_BAND=128 timeout 3600 python tools/run_dense_eigh.py 4096 1 2>&1 | tail -14
echo "q3a exit=$?"

echo "=== q3r: random n=16384 fresh headline ==="
BENCH_N=16384 BENCH_REPS=3 BENCH_EXTRA=0 \
  timeout 3600 python bench.py 2>&1 | tail -12
echo "q3r exit=$?"

echo "=== q3p: poisson n=16384 fresh ==="
BENCH_N=16384 BENCH_MATRIX=poisson BENCH_REPS=3 BENCH_EXTRA=0 \
  timeout 3600 python bench.py 2>&1 | tail -12
echo "q3p exit=$?"

echo "=== q3c: clustered n=4096 fresh (single-jit route) ==="
BENCH_N=4096 BENCH_MATRIX=clustered BENCH_REPS=3 BENCH_EXTRA=0 \
  timeout 2400 python bench.py 2>&1 | tail -12
echo "q3c exit=$?"
echo "=== queue3 done ==="
