# 256px training artifact exercising the FLASH attention path in real
# training (round 3; VERDICT r2 #8).  At the 256x256 G map the
# attention tokens are N=65536 with M=16384 downsampled K/V — far past
# the single-pass kernel's VMEM budget, so attention_fused dispatches to
# the key-axis-blocked flash kernels (online-softmax forward emitting
# logsumexp; two-kernel backward via the flash identity), previously
# parity-tested only (PARITY_TPU.json).  Short run on the hermetic
# synthetic 256px dataset:
#   python -m sagan_tpu.data.synthetic data/synthetic_256 --num 512 \
#       --img_size 256 --num_classes 4
output_name = "church256_flash"
config = {
    "num_devices": 1,
    "dataset": "synthetic256",
    "data_path": "data/synthetic_256",
    "data_size": -1,
    "model": "vanilla",
    "z_dim": 128,
    "gf_dim": 16,
    "df_dim": 16,
    "lr_g": 2e-4,
    "lr_d": 7e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [256],   # N=65536 -> flash path
    "attn_dim_D": [64],
    "use_label": False,
    "batch_size": 16,
    "loss": "hinge_loss",
    "epoch": 4,
    "update_ratio": 1,
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "use_pallas": True,    # force the fused path at every attention site
    "num_sample": 16,
    "summary_step_freq": 32,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
