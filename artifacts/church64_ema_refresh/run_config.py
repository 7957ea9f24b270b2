# Round-4 EMA re-baseline (VERDICT r3 item 6): the church64 TFRecord
# workflow re-run at HEAD with the flagship config's new generator EMA
# (example_configs/church64_attn.py now ships g_ema_decay 0.999), so
# the shipped-config FID trend reflects EMA sampling.  Identical to
# artifacts/church64_tfrecord/run_config.py (dataset recipe in
# artifacts/church64_tfrecord/make_dataset.py) except:
#   - g_ema_decay 0.999 (sampling + proxy-FID use the EMA net,
#     train/trainer.py::Trainer._sampling_vars)
#   - fid_epoch_freq 2 / fid_num_images 1024: a dense proxy-FID trend
#     to compare against the non-EMA round-3 run
# EMA does not touch the training dynamics, so per-epoch G/D losses
# should stay digit-for-digit equal to run_indexed.log — a free
# regression check on the round-4 trainer changes (exact accum-BN is a
# no-op at grad_accum_steps=1).
output_name = "church64_ema_refresh"
config = {
    "num_devices": None,

    "dataset": "church64_tfrecord",
    "data_path": "data/church64_tfrecord",
    "data_size": -1,

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
    "batch_size": 64,
    "loss": "hinge_loss",
    "epoch": 12,
    "update_ratio": 1,
    "g_ema_decay": 0.999,
    "compute_dtype": "bfloat16",
    "steps_per_call": 8,

    "num_sample": 16,
    "summary_step_freq": 50,
    "fid_epoch_freq": 2,
    "fid_num_images": 1024,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
