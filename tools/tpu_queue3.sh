#!/bin/bash
# Round-3 queue, take 2 (after the Spike clip-honesty fix f045298): re-measure
# every vectors config with the fixed epilogue, then the dense one-shots and
# tuning/bisect jobs.  Stop with: touch /tmp/tpu_queue.stop
# Logs: /tmp/tpu_queue3.log (this), /tmp/q3_*.log (per job).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue3.log
STOP=/tmp/tpu_queue.stop

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q3_${name}.log" 2>&1
  log "job $name: rc=$?"
}

log "queue3 started"
JOB_TIMEOUT=2400 run_job headline16384 env BENCH_N=16384 BENCH_REPS=3 python bench.py
JOB_TIMEOUT=2400 run_job poisson16384 env BENCH_N=16384 BENCH_MATRIX=poisson BENCH_REPS=2 python bench.py
JOB_TIMEOUT=1800 run_job clustered4096 env BENCH_N=4096 BENCH_MATRIX=clustered BENCH_REPS=3 python bench.py
JOB_TIMEOUT=3600 run_job dense16384 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=2400 run_job dense4096band env DENSE_BAND=128 python tools/run_dense_eigh.py 4096 2
JOB_TIMEOUT=4800 run_job dense16384band env DENSE_BAND=128 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=3600 run_job bench32768 python tools/backfill_bench_extra.py 32768 random 1 2
JOB_TIMEOUT=3600 run_job leafretune python tools/leaf_retune.py 16384 64 128
JOB_TIMEOUT=7200 run_job jacobibisect python tools/bisect_jacobi_fault.py
log "queue3 complete"
