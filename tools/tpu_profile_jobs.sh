#!/bin/bash
# Profiled headline + clustered runs (SE_PROFILE_BACKTRANSFORM=1) to direct
# the round-3 epilogue optimization.  Serializes with tpu_queue3.sh via the
# single-tenant device lock.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
log() { echo "$(date +%H:%M:%S) $*" >> /tmp/tpu_profile.log; }
run_job() {
  name=$1; shift
  log "job $name: start (waiting on device lock)"
  timeout 2400 flock /tmp/tpu_device.lock \
    env SE_DEVICE_LOCK_HELD=1 "$@" > "/tmp/qp_${name}.log" 2>&1
  log "job $name: rc=$?"
}
run_job prof_headline env SE_PROFILE_BACKTRANSFORM=1 BENCH_N=16384 BENCH_REPS=2 python bench.py
run_job prof_clustered env SE_PROFILE_BACKTRANSFORM=1 BENCH_N=4096 BENCH_MATRIX=clustered BENCH_REPS=2 python bench.py
log "profile jobs complete"
