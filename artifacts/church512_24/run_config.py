# Round-4 512px training artifact: the flash512 capability smoke
# (artifacts/flash512_smoke, 4 epochs) upgraded to a real multi-epoch
# stability run at current best practice — EMA 0.999 with delayed
# start, proxy-FID trend, dense D-health summaries — through the
# standard `python -m sagan_tpu.main` CLI on the real TPU v5e.
#
# The generator's attention site sits on the 512x512 map —
# N = 262,144 query tokens vs M = 65,536 stride-2-downsampled K/V, the
# largest flash-path shape in the repo: forward BN=512/BM=2048, fused
# one-pass backward with the 256 MB TRANSPOSED dq partial slab
# ([B, nk, D, N]; the [B, nk, N, D] layout 64x-padded to 16 GB and
# OOMed — see artifacts/flash512_smoke).  B=4 fits v5e HBM without
# rematerialization.  Dataset (hermetic):
#   python -m sagan_tpu.data.synthetic data/synthetic_512 --num 2048 \
#       --img_size 512 --num_classes 4
# Reference anchor: /root/reference/sagan/models/layers.py:94-116
# attention semantics at the 512px extension (the reference tops out
# at 128px configs); recipe = example_configs/church512_attn.py.
#
# GENTLE-D recipe (round 5): the first attempt used the church64
# defaults (lr_d 7e-4, 1024 images) and D memorized the dataset inside
# ONE epoch — D_loss 0.0000, D(real) +13, in-margin fractions 0.00/0.00
# from epoch 1 (run_saturating_lr7e4.log; the D-health metrics shipped
# for exactly this purpose).  Same mechanism the gf64 diagnosis
# documented (artifacts/imagenet128_gf64_diagnosis): tiny/easy data +
# hot D ⇒ memorization, G gradient starves.  Mitigation here = its
# measured gentle recipe (lr_d 1e-4) + 2x the data (2048 images;
# 1.5 GB HBM cache still fits beside the B=4 512px step).
output_name = "church512_24"
config = {
    "num_devices": 1,
    "dataset": "synthetic512",
    "data_path": "data/synthetic_512",
    "data_size": -1,
    "model": "vanilla",
    "z_dim": 128,
    "gf_dim": 16,
    "df_dim": 16,
    "lr_g": 2e-4,
    "lr_d": 1e-4,   # gentle: 7e-4 saturates D on this dataset (header)
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [512],   # N=262144 -> flash path, fused backward
    "attn_dim_D": [64],
    "use_label": False,
    "batch_size": 4,
    "loss": "hinge_loss",
    "epoch": 24,
    "update_ratio": 1,
    "g_ema_decay": 0.999,
    "g_ema_start": 1000,   # ~4 epochs: from-init EMA measured worse
                           # (artifacts/church64_ema_refresh)
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "use_pallas": True,    # force the flash path at every attention site
    "num_sample": 4,
    "summary_step_freq": 64,
    "fid_epoch_freq": 8,
    "fid_num_images": 256,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
