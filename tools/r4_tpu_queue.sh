#!/bin/bash
# Round-4 on-hardware work queue (VERDICT r3 items 1/2/3/6).  The axon
# device pool has been holding a stale lease for hours; each job below
# acquires through sagan_tpu.utils.device.wait_for_devices and simply
# waits its turn, so the whole queue drains unattended the moment the
# pool recovers.  ONE process touches the TPU at a time (CLAUDE.md);
# jobs run sequentially and each releases its lease on clean exit.
#
#   tmux new-session -d -s r4queue 'bash tools/r4_tpu_queue.sh'
#
# Progress: tail -f /tmp/r4_queue.log
set -u
cd /root/repo
Q=/tmp/r4_queue.log
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$Q"; }

# Fresh log + drained-flag reset: the log is append-only, so a stale
# "queue drained" line (or flag file) from a previous run would let the
# follow-up queue (r4_tpu_queue2.sh) start while this one still runs —
# two TPU processes at once.  Start THIS script before queue2.
rm -f /tmp/r4_queue_done
: > "$Q"

log "queue start"

# 1. Fresh BENCH_DETAIL.json at HEAD (also warms the compile cache for
#    the driver's end-of-round bench.py run).  Unbounded acquisition;
#    generous budget so all three secondary configs (incl.
#    church256_flash MFU accounting) get measured.
log "job 1: bench.py"
BENCH_DEVICE_TIMEOUT_S=999999 BENCH_BUDGET_S=5400 \
  python bench.py > /tmp/r4_bench.out 2> /tmp/r4_bench.err
log "job 1 done rc=$? headline: $(head -c 300 /tmp/r4_bench.out)"

# 2. 256px flash floor study (VERDICT r3 item 2)
log "job 2: bench_attn_floor256"
python tools/bench_attn_floor256.py > /tmp/r4_floor256.log 2>&1
log "job 2 done rc=$?"

# 3. Paper-scale gentle recipe to 30 epochs (VERDICT r3 item 3)
log "job 3: imagenet128_gf64_gentle30"
python -m sagan_tpu.main \
  --config_path artifacts/imagenet128_gf64_gentle30/run_config.py \
  > artifacts/imagenet128_gf64_gentle30/run.log 2>&1
log "job 3 done rc=$?"

# 4. church64 EMA re-baseline at HEAD (VERDICT r3 item 6 + the round-3
#    pending TFRecord-refresh), then EMA-vs-raw proxy-FID from the same
#    checkpoint.
log "job 4: church64_ema_refresh"
python -m sagan_tpu.main \
  --config_path artifacts/church64_ema_refresh/run_config.py \
  > artifacts/church64_ema_refresh/run.log 2>&1
log "job 4 done rc=$?"
log "job 4b: evaluate ema vs raw"
python -m sagan_tpu.evaluate \
  --config_path artifacts/church64_ema_refresh/run_config.py --no_is \
  > artifacts/church64_ema_refresh/eval_ema.json 2>/tmp/r4_eval_ema.err
python -m sagan_tpu.evaluate \
  --config_path artifacts/church64_ema_refresh/run_config.py --no_is --raw_g \
  > artifacts/church64_ema_refresh/eval_raw.json 2>/tmp/r4_eval_raw.err
log "job 4b done"

log "queue drained"
touch /tmp/r4_queue_done
