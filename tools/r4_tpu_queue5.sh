#!/bin/bash
# Round-4 queue #5: the fused-backward 256px training artifact and the
# 512px capability smoke.
#   job 1: 30-epoch church256 run with the fused one-pass flash
#          backward + EMA + proxy-FID trend (replaces the round-3
#          4-epoch smoke at 432 ms/step) -> artifacts/church256_fused30
#   job 2: EMA-vs-raw offline eval of the final checkpoint
#   job 3: 512px flash smoke, N=262,144 attention tokens — two stages
#          past the reference's max -> artifacts/flash512_smoke
# ONE TPU process at a time (CLAUDE.md); jobs run sequentially, each
# acquires via sagan_tpu.utils.device.wait_for_devices and releases its
# lease on clean exit.  Job 0 is the wedge-recovery probe pattern
# (fresh bounded claim processes — a long-blocked in-process claim may
# never recover).
#
#   nohup bash tools/r4_tpu_queue5.sh > /tmp/r4_queue5_outer.log 2>&1 &
# Progress: tail -f /tmp/r4_queue5.log
set -u
cd /root/repo
Q=/tmp/r4_queue5.log
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$Q"; }
rm -f /tmp/r4_queue5_done
: > "$Q"

log "queue5 start"

log "job 0: pool health probe (fresh bounded probes)"
attempt=0
until timeout 120 python - >> /tmp/r4_probe5.log 2>&1 <<'PYEOF'
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
log "job 0: pool healthy (after $attempt failed probes)"

log "job 1: church256_fused30 (30 epochs, fused flash backward)"
if [ ! -d data/synthetic_256 ]; then
  python -m sagan_tpu.data.synthetic data/synthetic_256 --num 2048 \
    --img_size 256 --num_classes 4 >> "$Q" 2>&1
fi
timeout 5400 python -m sagan_tpu.main \
  --config_path artifacts/church256_fused30/run_config.py \
  > /tmp/r4_c256f30.log 2>&1
log "job 1 done rc=$? $(grep -c 'G_loss' /tmp/r4_c256f30.log) epoch lines; last: $(grep 'G_loss' /tmp/r4_c256f30.log | tail -1)"

log "job 2: EMA-vs-raw offline eval of the final church256 checkpoint"
timeout 1800 python -m sagan_tpu.evaluate \
  --config_path artifacts/church256_fused30/run_config.py \
  > /tmp/r4_c256f30_eval_ema.json 2> /tmp/r4_c256f30_eval.log
rc_a=$?
timeout 1800 python -m sagan_tpu.evaluate \
  --config_path artifacts/church256_fused30/run_config.py --raw_g \
  > /tmp/r4_c256f30_eval_raw.json 2>> /tmp/r4_c256f30_eval.log
log "job 2 done rc=$rc_a/$? ema: $(tail -c 200 /tmp/r4_c256f30_eval_ema.json 2>/dev/null) raw: $(tail -c 200 /tmp/r4_c256f30_eval_raw.json 2>/dev/null)"

log "job 3: flash512_smoke (N=262144 attention tokens, 4 epochs)"
if [ ! -d data/synthetic_512 ]; then
  python -m sagan_tpu.data.synthetic data/synthetic_512 --num 512 \
    --img_size 512 --num_classes 4 >> "$Q" 2>&1
fi
timeout 3600 python -m sagan_tpu.main \
  --config_path artifacts/flash512_smoke/run_config.py \
  > /tmp/r4_f512.log 2>&1
log "job 3 done rc=$? $(grep -c 'G_loss' /tmp/r4_f512.log) epoch lines; last: $(grep 'G_loss' /tmp/r4_f512.log | tail -1)"

log "queue5 drained"
touch /tmp/r4_queue5_done
