#!/bin/bash
# Round-5 queue: the hardware jobs behind VERDICT r4 items 2, 5, 6.
#   job 1: head-width A/B arm A (reference widths) — church64 TFRecord
#          workflow, 30 epochs, dense proxy-FID trend
#          -> artifacts/church64_qk32_ab (run_a.log)
#   job 2: arm B — identical recipe + attn_qk_dim 32 (run_b.log)
#   job 3: church512_24 — the 24-epoch 512px stability run whose
#          round-4 claim shipped without evidence (VERDICT r4 weak 1)
#          -> artifacts/church512_24 (run.log)
#   job 4: serving ladder latency measurement (n=1 on a --batch 64
#          server, ladder on/off) -> /tmp/r5/serve_ladder.log
# ONE TPU process at a time (CLAUDE.md); jobs run sequentially, each
# acquires via sagan_tpu.utils.device.wait_for_devices and releases on
# clean exit.  Job 0 is the r4 wedge-recovery probe pattern (fresh
# bounded claim processes).
#
#   nohup bash tools/r5_tpu_queue.sh > /tmp/r5_queue_outer.log 2>&1 &
# Progress: tail -f /tmp/r5_queue.log
set -u
cd /root/repo
Q=/tmp/r5_queue.log
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$Q"; }
rm -f /tmp/r5_queue_done
: > "$Q"
mkdir -p /tmp/r5

log "queue start"

log "job 0: pool health probe (fresh bounded probes)"
attempt=0
until timeout 120 python - >> /tmp/r5_probe.log 2>&1 <<'PYEOF'
import jax
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((64, 64), jnp.bfloat16)
v = float(jax.device_get((x @ x).sum()))
print("DEVICE_OK", d[0].device_kind, v, flush=True)
PYEOF
do
  attempt=$((attempt + 1))
  if [ $((attempt % 20)) -eq 0 ]; then
    log "job 0: still wedged after $attempt probes"
  fi
  sleep 30
done
log "job 0: pool healthy after $attempt retries"

log "job 1: head-width A/B arm A (reference widths)"
timeout 3600 python -m sagan_tpu.main \
  --config_path artifacts/church64_qk32_ab/run_config_a.py \
  > artifacts/church64_qk32_ab/run_a.log 2>&1
log "job 1 rc=$?"

log "job 2: head-width A/B arm B (attn_qk_dim 32)"
timeout 3600 python -m sagan_tpu.main \
  --config_path artifacts/church64_qk32_ab/run_config_b.py \
  > artifacts/church64_qk32_ab/run_b.log 2>&1
log "job 2 rc=$?"

log "job 3: church512_24 stability run (24 epochs, ~2h)"
timeout 14400 python -m sagan_tpu.main \
  --config_path artifacts/church512_24/run_config.py \
  > artifacts/church512_24/run.log 2>&1
log "job 3 rc=$?"

log "job 4: serving ladder latency"
timeout 3600 python tools/bench_serve_ladder.py \
  > /tmp/r5/serve_ladder.log 2>&1
log "job 4 rc=$?"

log "job 5: on-TPU kernel parity refresh (CostEstimate edits touched every kernel program)"
timeout 5400 python tools/pallas_parity.py PARITY_TPU.json \
  > /tmp/r5/parity.log 2>&1
log "job 5 rc=$?"

log "queue done"
touch /tmp/r5_queue_done
