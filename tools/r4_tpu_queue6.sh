#!/bin/bash
# Round-4 queue #6: productize 512px.
#   job 1: regenerate the hermetic 512px dataset (box reboot wiped
#          generated data; recipe is deterministic)
#   job 2: 24-epoch church512 run (flash fwd BN=512/BM=2048 + fused
#          one-pass backward with the transposed 256 MB dq slab, EMA,
#          proxy-FID trend) -> artifacts/church512_30
#   job 3: EMA-vs-raw offline eval of the final checkpoint
#   job 4: curves extraction for the artifact
# ONE TPU process at a time (CLAUDE.md); jobs run sequentially.
#
#   nohup bash tools/r4_tpu_queue6.sh > /tmp/r4_queue6_outer.log 2>&1 &
# Progress: tail -f /tmp/r4_queue6.log
set -u
cd /root/repo
Q=/tmp/r4_queue6.log
log() { echo "[$(date -u +%H:%M:%S)] $*" >> "$Q"; }
rm -f /tmp/r4_queue6_done
: > "$Q"

log "queue6 start"

if [ ! -d data/synthetic_512 ]; then
  log "job 1: regenerate data/synthetic_512"
  python -m sagan_tpu.data.synthetic data/synthetic_512 --num 1024 \
    --img_size 512 --num_classes 4 >> "$Q" 2>&1
  log "job 1 done rc=$?"
fi

log "job 2: church512_30 (24 epochs, ~100 min)"
timeout 9000 python -m sagan_tpu.main \
  --config_path artifacts/church512_30/run_config.py \
  > /tmp/r4_c512.log 2>&1
log "job 2 done rc=$? epochs=$(grep -c 'G_loss' /tmp/r4_c512.log); last: $(grep 'G_loss' /tmp/r4_c512.log | tail -1)"

log "job 3: EMA + raw offline eval of the final checkpoint"
timeout 2400 python -m sagan_tpu.evaluate \
  --config_path artifacts/church512_30/run_config.py \
  > /tmp/r4_c512_eval_ema.json 2> /tmp/r4_c512_eval.log
log "job 3a (ema) rc=$?"
timeout 2400 python -m sagan_tpu.evaluate \
  --config_path artifacts/church512_30/run_config.py --raw_g \
  > /tmp/r4_c512_eval_raw.json 2>> /tmp/r4_c512_eval.log
log "job 3b (raw) rc=$?"

log "job 4: curves extraction"
python tools/extract_curves.py logs/church512_30 \
  > /tmp/r4_c512_curves.json 2>> "$Q"
log "job 4 done rc=$?"

log "queue6 done"
touch /tmp/r4_queue6_done
