# BigGAN-style large-batch 128x128: batch 2048 data-parallel over a pod,
# cross-replica BN — BASELINE.json config #5.  batch_size is per device:
# 2048 global over a v5e-256 slice (or scale num_devices down).
# Optional: "model_parallel": 2 switches to a 2-D (data, model) mesh —
# wide kernels column-shard over the model axis under GSPMD (use when a
# scaled-up gf_dim/batch no longer fits one chip's HBM).
# Optional: "grad_accum_steps": A keeps the 2048 effective batch on a
# small slice (set batch_size = 2048/num_devices and A to shrink
# activation memory A-fold).
output_name = "biggan128_pod_b2048"
config = {
    "num_devices": None,           # all devices in the slice
    "dataset": "imagenet",
    "data_path": "data/imagenet_labeled_128",
    "data_size": -1,
    "model": "resnet",
    "z_dim": 128,
    "gf_dim": 32,
    "df_dim": 32,
    # Gentle-D recipe (round-4): lr_d 4e-4 / update_ratio 2 (the paper's
    # TTUR) saturated the discriminator on every instrumented gf>=32 run
    # (artifacts/imagenet128_gf64_diagnosis/ — D_loss -> 0, degenerate
    # gradients).  That was measured at batch 64; a 2048 batch gives D
    # 32x cleaner gradients per step, which makes saturation MORE likely,
    # not less — so the pod config ships the validated gentle recipe.
    # If D_*_in_margin metrics sit near 1.0 (D too weak), step lr_d
    # toward 4e-4 before touching update_ratio.
    "lr_g": 1e-4,
    "lr_d": 1e-4,
    "decay_rate": 1.0,
    "use_attention": True,
    "attn_dim_G": [64],
    "attn_dim_D": [64],
    "use_label": True,
    "use_cond_bn": True,
    "batch_size": 8,               # x256 chips = 2048 global
    "loss": "hinge_loss",
    "epoch": 100,
    "update_ratio": 1,       # gentle-D (see note above)
    "g_ema_decay": 0.9999,   # EMA generator for eval/FID (standard GAN
                             # practice; 0.9999 suits pod-scale step
                             # counts — use 0.999 for short runs)
    "g_ema_start": 5000,     # delayed EMA start (BigGAN practice;
                             # artifacts/church64_ema_refresh)
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "num_sample": 16,
    "summary_step_freq": 50,
    "fid_epoch_freq": 5,
    "fid_num_images": 50000,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
