# LSUN-church 64x64 unconditional SAGAN — the reference's headline config
# (/root/reference/example_configs/church64_attn.py), TPU edition.
output_name = "church64_2attn_z128_b64_e100"
config = {
    "_description": "attention at the 32/64 G maps and 8/4 D maps.",
    # devices: data-parallel width; None/absent = all local TPU chips
    "num_devices": None,
    "gpu": [0],  # legacy key, honored if num_devices is unset

    # data
    "dataset": "Lsun_church",
    "data_path": "data/Lsun_church_unlabeled_64",
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
    "attn_dim_G": [32, 64],
    "attn_dim_D": [8, 4],
    "use_label": False,
    "batch_size": 64,            # per device
    "loss": "hinge_loss",
    "epoch": 100,
    "update_ratio": 1,
    "g_ema_decay": 0.999,    # sample/FID from the EMA generator
                             # (BigGAN/SAGAN eval practice; the trainer
                             # uses ema_g for grids + FID when set)
    "g_ema_start": 2000,     # EMA copies raw G until step 2000 (~11 epochs):
                             # from-init EMA measured WORSE than raw early
                             # (proxy-FID 5.51 vs 3.49 at 2.2k steps,
                             # artifacts/church64_ema_refresh)
    "compute_dtype": "bfloat16",
    "steps_per_call": 8,

    # eval & output
    "num_sample": 16,
    "summary_step_freq": 100,
    "fid_epoch_freq": 10,
    "fid_num_images": 5000,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
