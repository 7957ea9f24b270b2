# LSUN-church 512x512 unconditional SAGAN — THREE size doublings past
# the reference's largest configuration (128px,
# /root/reference/example_configs/*), productized from the round-4
# capability smoke (artifacts/flash512_smoke).
#
# The generator's attention site sits on the 512x512 map:
# N = 262,144 query tokens vs M = 65,536 stride-2-downsampled K/V —
# flash-path territory (key-axis-blocked online-softmax kernels,
# ops/pallas_attention.py).  The forward picks BN=512/BM=2048 blocks
# and the fused one-pass backward emits a 256 MB transposed dq partial
# slab; the B=4 step fits v5e HBM without rematerialization (set
# "remat": True to trade ~one stage recompute for headroom if you
# raise the batch).  Measured anchor: 927 ms/step at B=4 on a v5e
# (BENCH_DETAIL.json church512_flash; first smoke:
# artifacts/flash512_smoke).  Stability evidence: the 24-epoch
# hardware run artifacts/church512_24 — same model/attention shape,
# shorter than this config's 30-epoch default (the epoch count here is
# a length suggestion, not what the artifact proves).  D-health
# caution from that run: on a SMALL dataset the church64 lr_d below
# saturates D within an epoch at 512px (each image is 64x the pixels
# of a 64px one — far easier to memorize); watch the in_margin
# fractions and drop lr_d toward 1e-4 if they pin at 0.00 (the
# artifact's run_config.py documents the measured mitigation).
#
# Reference anchor: /root/reference/sagan/models/layers.py:94-116
# attention semantics + example_configs/church64_attn.py recipe,
# extended to 512px.
output_name = "church512_2attn_z128_b4"
config = {
    "_description": "512px flash-attention flagship: attention at the "
                    "512 G map and 64 D map.",
    "num_devices": None,

    # data — convert LSUN church at 512px with data/convert.py, or any
    # folder of JPEGs via use_image_generator
    "dataset": "Lsun_church",
    "data_path": "data/Lsun_church_unlabeled_512",
    "data_size": -1,

    # model & training
    "model": "vanilla",
    "z_dim": 128,
    "gf_dim": 16,
    "df_dim": 16,
    "lr_g": 2e-4,
    "lr_d": 7e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [512],     # N=262144 → flash path, fused backward
    "attn_dim_D": [64],
    "use_label": False,
    "batch_size": 4,         # per device; B=4 fits v5e HBM w/o remat
    "loss": "hinge_loss",
    "epoch": 30,
    "update_ratio": 1,
    "g_ema_decay": 0.999,    # sample/FID from the EMA generator
    "g_ema_start": 1000,     # EMA copies raw G until ~step 1000 (from-
                             # init EMA measured worse early:
                             # artifacts/church64_ema_refresh)
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "use_pallas": True,

    # eval & output
    "num_sample": 4,
    "summary_step_freq": 64,
    "fid_epoch_freq": 10,
    "fid_num_images": 512,   # 512px forward passes are ~1 img/25ms;
                             # keep the in-loop proxy-FID pass bounded
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
