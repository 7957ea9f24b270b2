#!/bin/bash
# Round-4 queue #4: validate the fused one-pass flash backward on the
# real chip, then refresh the bench detail (also warms the compile
# cache for the driver's end-of-round bench.py run — the backward
# change invalidates the cached 256px step program).
# ONE TPU process at a time (CLAUDE.md); jobs run sequentially.
#
#   nohup bash tools/r4_tpu_queue4.sh > /tmp/r4_queue4_outer.log 2>&1 &
set -u
cd /root/repo
Q=/tmp/r4_queue4.log
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$Q"; }
: > "$Q"

log "queue4 start"

log "job 0: training CLI smoke (verify recipe)"
if [ ! -d data/synthetic_32 ]; then
  python -m sagan_tpu.data.synthetic data/synthetic_32 --num 2048 \
    --img_size 32 >> "$Q" 2>&1
fi
timeout 900 python -m sagan_tpu.main \
  --config_path example_configs/test.py > /tmp/r4_cli_smoke.log 2>&1
log "job 0 done rc=$? $(grep -c 'G_loss' /tmp/r4_cli_smoke.log) epoch lines"

log "job A: pallas_parity (incl. fused bwd @256px shape)"
timeout 3000 python tools/pallas_parity.py > /tmp/r4_parity.log 2>&1
log "job A done rc=$? $(tail -1 /tmp/r4_parity.log)"

log "job B: bench.py refresh (fused bwd in the 256px step)"
BENCH_DEVICE_TIMEOUT_S=3600 BENCH_BUDGET_S=5400 \
  timeout 7200 python bench.py > /tmp/r4_bench2.out 2> /tmp/r4_bench2.err
log "job B done rc=$? headline: $(head -c 300 /tmp/r4_bench2.out)"

log "queue4 drained"
touch /tmp/r4_queue4_done
