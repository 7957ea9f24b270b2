#!/bin/bash
# Round-4 on-hardware work queue (VERDICT r3 items 1/2/3/6).  The axon
# device pool has been holding a stale lease for >24 h; the only
# empirically-working recovery pattern (memory: axon-device-wedge) is
# FRESH bounded probe processes — a single long-blocked in-process
# claim loop may never recover even after the pool does.  So job 0
# watches for recovery with fresh probes; the real jobs only start on a
# healthy pool, each acquiring through
# sagan_tpu.utils.device.wait_for_devices.  ONE process touches the TPU
# at a time (CLAUDE.md); jobs run sequentially and each releases its
# lease on clean exit.
#
#   nohup bash tools/r4_tpu_queue.sh > /tmp/r4_queue_outer.log 2>&1 &
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

# 0. Recovery watch: fresh bounded probes (one claim client per
#    attempt) until the pool grants.  A probe is granted, computes one
#    matmul, fetches it, and exits — releasing the lease for job 1.
log "job 0: pool recovery watch (fresh bounded probes)"
attempt=0
until timeout 120 python - >> /tmp/r4_probe.log 2>&1 <<'PYEOF'
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
  sleep 45
done
log "job 0: pool recovered after $attempt failed probes"

# 1. Fresh BENCH_DETAIL.json at HEAD (also warms the compile cache for
#    the driver's end-of-round bench.py run).  Acquisition bounded but
#    generous (job 0 already proved the pool healthy); budget sized so
#    all three secondary configs (incl. church256_flash MFU accounting)
#    get measured — its clock starts at device grant.
log "job 1: bench.py"
BENCH_DEVICE_TIMEOUT_S=3600 BENCH_BUDGET_S=5400 \
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
