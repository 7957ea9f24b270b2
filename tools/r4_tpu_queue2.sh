#!/bin/bash
# Follow-up hardware jobs appended after r4_tpu_queue.sh was already
# running (a bash script must not be edited mid-execution).  Waits for
# the first queue to drain (ONE TPU process at a time), then runs the
# attention head-width A/B (tools/bench_attn_qk.py).
set -u
cd /root/repo
Q=/tmp/r4_queue.log
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$Q"; }

# Wait on the flag FILE, not a log line: the log is append-only, so a
# "queue drained" line from a previous run is indistinguishable from
# this run's.  r4_tpu_queue.sh removes the flag at start and touches it
# at drain; start queue1 first.
until [ -f /tmp/r4_queue_done ]; do sleep 60; done

log "job 5: bench_attn_qk"
python tools/bench_attn_qk.py > /tmp/r4_attn_qk.log 2>&1
log "job 5 done rc=$?"
log "queue2 drained"
