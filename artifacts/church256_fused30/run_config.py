# Round-4 256px training artifact with the FUSED one-pass flash
# backward engaged (ops/pallas_attention.py::_flash_bwd_fused, adopted
# after tools/bench_attn_bwd256.py measured 135.7 vs 213.4 ms at this
# exact attention shape).  Replaces the round-3 4-epoch smoke
# (artifacts/church256_flash, 432 ms/step with the original block picks
# and two-kernel backward) with a real 30-epoch run at current best
# practice: EMA 0.999 with delayed start, proxy-FID trend every 5
# epochs, dense D-health summaries.
#
# The generator's attention site sits on the 256x256 map — N = 65,536
# query tokens vs M = 16,384 stride-2-downsampled K/V, forward AND
# fused one-pass backward, every step.  Dataset (hermetic, fast):
#   python -m sagan_tpu.data.synthetic data/synthetic_256 --num 2048 \
#       --img_size 256 --num_classes 4
# Reference anchor: the attention semantics being exercised are
# /root/reference/sagan/models/layers.py:94-116 at the 256px extension
# (the reference itself tops out at 128px configs).
output_name = "church256_fused30"
config = {
    "num_devices": 1,
    "dataset": "synthetic256",
    "data_path": "data/synthetic_256",
    "data_size": -1,
    "model": "vanilla",
    "z_dim": 128,
    "gf_dim": 16,
    "df_dim": 16,
    "lr_g": 2e-4,
    "lr_d": 7e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [256],   # N=65536 -> flash path, fused backward
    "attn_dim_D": [64],
    "use_label": False,
    "batch_size": 16,
    "loss": "hinge_loss",
    "epoch": 30,
    "update_ratio": 1,
    "g_ema_decay": 0.999,
    "g_ema_start": 500,    # ~4 epochs: from-init EMA measured worse
                           # (artifacts/church64_ema_refresh)
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "use_pallas": True,    # force the fused path at every attention site
    "num_sample": 16,
    "summary_step_freq": 32,
    "fid_epoch_freq": 5,
    "fid_num_images": 512,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
