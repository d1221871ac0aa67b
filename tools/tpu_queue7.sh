#!/bin/bash
# Round-3 queue, final: retry the one-stage dense n=16384 artifact with the
# hardened run_dense_eigh (timing persisted before self-checks) once queue6
# drains.  Launch AFTER queue6's last job starts, or jobs may interleave.
# Stop with: touch /tmp/tpu_queue7.stop
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/tpu_queue7.log
STOP=/tmp/tpu_queue7.stop

log() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

run_job() {
  name=$1; shift
  [ -f "$STOP" ] && { log "stop file; skipping $name"; return; }
  log "job $name: start"
  timeout "$JOB_TIMEOUT" flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/q7_${name}.log" 2>&1
  log "job $name: rc=$?"
}

log "queue7 started"
JOB_TIMEOUT=10800 run_job dense16384 python tools/run_dense_eigh.py 16384 1
log "queue7 complete"
