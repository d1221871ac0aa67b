#!/bin/bash
# Round-3 queue, take 4 (queue4 died with its session after prof_clustered):
# re-measure the headline with the filtered-epilogue pipeline, then the
# dense one-shots, the n=32768 extras config, leaf retune, Jacobi bisect.
# Stop with: touch /tmp/tpu_queue.stop
# Logs: /tmp/tpu_queue5.log (this), /tmp/q5_*.log (per job).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue5.log
STOP=/tmp/tpu_queue.stop

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q5_${name}.log" 2>&1
  log "job $name: rc=$?"
}

log "queue5 started"
JOB_TIMEOUT=2400 run_job headline16384 python tools/backfill_bench_extra.py 16384 random 1 3
JOB_TIMEOUT=3600 run_job dense16384 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=3600 run_job leafretune python tools/leaf_retune.py 16384 64 128
JOB_TIMEOUT=3600 run_job bench32768 python tools/backfill_bench_extra.py 32768 random 1 2
JOB_TIMEOUT=2400 run_job dense4096band env DENSE_BAND=128 python tools/run_dense_eigh.py 4096 2
JOB_TIMEOUT=4800 run_job dense16384band env DENSE_BAND=128 python tools/run_dense_eigh.py 16384 1
JOB_TIMEOUT=7200 run_job jacobibisect python tools/bisect_jacobi_fault.py
log "queue5 complete"
