# Quality-trend validation run (round 2): the paper-scale SAGAN
# (arXiv:1805.08318 setup — class-conditional ResNet G/D at gf/df 64,
# 128px, conditional BN, projection discriminator, attention at 32,
# hinge, TTUR, update_ratio 2) trained on the hermetic synthetic
# 128px/8-class dataset on the real TPU.  This is the heaviest
# configuration the benchmark measures (47% MFU, bench.py
# imagenet128_paper_gf64); the run demonstrates it also *trains* stably
# end-to-end on hardware, not just benches.
output_name = "imagenet128_gf64_diag_synth"
config = {
    "num_devices": 1,
    "dataset": "synthetic128",
    "data_path": "data/synthetic_128",
    "data_size": -1,
    "model": "resnet",
    "z_dim": 128,
    "gf_dim": 64,
    "df_dim": 64,
    "lr_g": 1e-4,
    "lr_d": 4e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [32],
    "attn_dim_D": [32],
    "use_label": True,
    "use_cond_bn": True,
    "batch_size": 64,
    "loss": "hinge_loss",
    "epoch": 10,
    "update_ratio": 2,
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "g_ema_decay": 0.999,
    "num_sample": 16,
    "summary_step_freq": 64,
    "fid_epoch_freq": 5,
    "fid_num_images": 1024,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
