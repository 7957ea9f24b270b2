# Paper-scale SAGAN (arXiv:1805.08318 setup): ImageNet 128x128,
# class-conditional ResNet G/D at gf/df 64, conditional BN, projection
# discriminator, attention at the 32 maps, hinge loss.
#
# RECIPE NOTE — this config ships the *gentle* stability recipe
# (lr_d 1e-4, update_ratio 1, EMA 0.999), NOT the paper's TTUR
# (lr_d 4e-4, update_ratio 2).  The paper recipe was diagnosed to
# saturate the discriminator at this scale on this trainer
# (D_loss -> 0 by epoch ~8, degenerate adversarial signal — three
# instrumented hardware runs in artifacts/imagenet128_gf64_diagnosis/);
# the gentle recipe keeps healthy hinge margins at equal-or-better
# proxy-FID.  Watch the D_real_in_margin / D_fake_in_margin metrics:
# values pinned near 0 mean D has saturated and lr_d should come down.
#
# Reference scale: /root/reference/example_configs/church64_attn.py
# config style; the gf_dim=64 model matches the paper, not the
# reference's gf_dim=16 default (/root/reference/models/generator.py:23).
output_name = "imagenet128_paper_gf64"
config = {
    "num_devices": None,           # all local chips, data-parallel
    "dataset": "imagenet",
    "data_path": "data/imagenet_labeled_128",
    "data_size": -1,
    "model": "resnet",
    "z_dim": 128,
    "gf_dim": 64,
    "df_dim": 64,
    "lr_g": 1e-4,
    "lr_d": 1e-4,                  # gentle: paper's 4e-4 saturates D here
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [32],
    "attn_dim_D": [32],
    "use_label": True,
    "use_cond_bn": True,
    "batch_size": 64,              # per device
    "loss": "hinge_loss",
    "epoch": 100,
    "update_ratio": 1,             # gentle: paper's 2 compounds saturation
    "g_ema_decay": 0.999,          # grids + FID sample the EMA generator
    "g_ema_start": 2000,           # delayed EMA start (BigGAN practice;
                                   # artifacts/church64_ema_refresh)
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
