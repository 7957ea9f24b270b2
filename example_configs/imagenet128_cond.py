# ImageNet 128x128 conditional SAGAN with TTUR + attention at the 32/64
# maps — BASELINE.json config #4 (the north-star FID target), resnet
# family like the legacy ImageNet-128 pipeline
# (/root/reference/models/generator.py).
output_name = "imagenet128_cond_res_b64"
config = {
    "num_devices": None,
    "dataset": "imagenet",
    "data_path": "data/imagenet_labeled_128",
    "data_size": -1,
    "model": "resnet",
    "z_dim": 128,
    "gf_dim": 16,
    "df_dim": 16,
    "lr_g": 1e-4,
    "lr_d": 4e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [32, 64],
    "attn_dim_D": [32, 64],
    "use_label": True,
    "use_cond_bn": True,
    "batch_size": 64,
    "loss": "hinge_loss",
    "epoch": 100,
    "update_ratio": 2,
    "g_ema_decay": 0.999,    # EMA generator for eval/FID (standard GAN
                             # practice; 0.999 ramps up in ~1k steps —
                             # right for these run lengths, vs 0.9999
                             # which needs ~10k steps to diverge from
                             # the live params)
    "g_ema_start": 2000,     # delayed EMA start (BigGAN practice; measured
                             # need: artifacts/church64_ema_refresh)
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "num_sample": 16,
    "summary_step_freq": 100,
    "fid_epoch_freq": 5,
    "fid_num_images": 50000,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
