#!/bin/bash
# Round-5 TPU queue 6: verified one-stage dense n=16384 (the committed
# DENSE_EIGH entry has only the trace check: the round-5 chunked
# dense_residual checker landed AFTER that measurement, and the saved V
# lived in /tmp which the VM restart wiped).  Runs after r5_queue5.sh.
set -u
cd /root/repo
export PYTHONPATH=.:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# serialize behind queue5 on the single-process tunnel
while [ -f /tmp/q5.pid ] && ps -p "$(cat /tmp/q5.pid)" >/dev/null 2>&1; do
  sleep 30
done

echo "=== q6a: one-stage dense n=16384 with chunked residual/ortho checks ==="
timeout 5400 python tools/run_dense_eigh.py 16384 1 2>&1 | grep -v cpu_aot_loader | tail -16
echo "q6a exit=$?"
echo "=== queue6 done ==="
