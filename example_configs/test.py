# Quick end-to-end smoke config (the analog of the reference's
# example_configs/test.py truncated run) on a self-generated synthetic
# dataset: python -m sagan_tpu.data.synthetic data/synthetic_32 first, or
# let tests create it.
output_name = "test_run"
config = {
    "num_devices": None,
    "dataset": "synthetic",
    "data_path": "data/synthetic_32",
    "data_size": 2000,
    "model": "vanilla",
    "z_dim": 32,
    "gf_dim": 8,
    "df_dim": 8,
    "lr_g": 2e-4,
    "lr_d": 7e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [16],
    "attn_dim_D": [8],
    "use_label": False,
    "batch_size": 16,
    "loss": "hinge_loss",
    "epoch": 10,
    "update_ratio": 1,
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "num_sample": 16,
    "summary_step_freq": 10,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
