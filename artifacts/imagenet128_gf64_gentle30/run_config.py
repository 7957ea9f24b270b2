# Round-4 productization run (VERDICT r3 item 3): the SHIPPED
# paper-scale config (example_configs/imagenet128_paper_gf64.py —
# gentle recipe: lr_d 1e-4, update_ratio 1, g_ema_decay 0.999) taken
# to 30 epochs on the richest converted dataset in this environment
# (data/imagenet128_tfrecord: 12,000 structured JPEGs -> data/convert.py
# -> TFRecords; build recipe in
# artifacts/church64_tfrecord/make_dataset.py, 128px variant per
# artifacts/imagenet128_gf64_diagnosis/run_config_tfrec.py's header).
#
# Differences from the shipped config: dataset/data_path point at the
# local TFRecords, epoch 100 -> 30 (the saturating run's length),
# fid_num_images 50000 -> 1024 (proxy-FID trend cadence; this dataset
# has 12k reals), and summary_step_freq tightened so the D-health
# curves (D_real_in_margin / D_fake_in_margin, D_real_mean) are dense
# enough to certify "healthy margins throughout".
output_name = "imagenet128_gf64_gentle30"
config = {
    "num_devices": 1,
    "dataset": "imagenet128_tfrecord",
    "data_path": "data/imagenet128_tfrecord",
    "data_size": -1,
    "model": "resnet",
    "z_dim": 128,
    "gf_dim": 64,
    "df_dim": 64,
    "lr_g": 1e-4,
    "lr_d": 1e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [32],
    "attn_dim_D": [32],
    "use_label": True,
    "use_cond_bn": True,
    "batch_size": 64,
    "loss": "hinge_loss",
    "epoch": 30,
    "update_ratio": 1,
    "g_ema_decay": 0.999,
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "num_sample": 16,
    "summary_step_freq": 64,
    "fid_epoch_freq": 5,
    "fid_num_images": 1024,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
