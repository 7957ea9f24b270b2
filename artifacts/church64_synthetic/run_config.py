# Quality-trend validation run (round 2): the church64 architecture
# (vanilla G/D, gf/df 16, attention at 32/64, hinge, TTUR) trained on the
# hermetic synthetic 64px dataset, with EMA and proxy-FID every 5 epochs.
# Committed artifacts in this directory: run.log (stdout), fid_curve.json
# (extracted from the event file), sample grids at epochs 0/30/60/99.
output_name = "church64_synth_r2"
config = {
    "num_devices": 1,
    "dataset": "synthetic64",
    "data_path": "data/synthetic_64",
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
    "epoch": 100,
    "update_ratio": 1,
    "compute_dtype": "bfloat16",
    "steps_per_call": 8,
    "g_ema_decay": 0.999,
    "num_sample": 16,
    "summary_step_freq": 64,
    "fid_epoch_freq": 5,
    "fid_num_images": 2048,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
