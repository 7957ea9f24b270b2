# Round-4 512px capability smoke: TWO stages past the reference's
# largest configuration (the reference tops out at 128px,
# /root/reference/example_configs/*; our round-3 extension was 256px).
# The generator's attention site sits on the 512x512 map —
# N = 262,144 query tokens vs M = 65,536 downsampled K/V — the largest
# flash-path shape any run has exercised: forward picks BN=512/BM=2048,
# the fused one-pass backward picks BN=512/BM=2048 with a 256 MB dq
# partial slab (within DQ_SLAB_LIMIT).  Goal: finite losses + grids for
# a few epochs, demonstrating the kernel/VMEM accounting holds one
# doubling beyond everything benchmarked.
#
# This config is the run that CAUGHT the dq-slab layout bug: with the
# slab emitted [B, nk, N, D], the forced major-to-minor Pallas output
# layout lane-padded D=2 to 128 — the 256 MB slab ballooned to 16 GB
# and the B=4 step OOMed at compile (17.93 GiB needed vs 15.75 GiB v5e
# HBM; remat barely moved it — 17.83 GiB — because the residuals were
# never the problem).  The slab is now emitted transposed [B, nk, D, N]
# (ops/pallas_attention.py), the step fits WITHOUT remat, and the same
# fix measured a further 15% off the fused backward at the 256px
# training shape (tools/bench_dq_slab_layout.py).  Dataset (hermetic):
#   python -m sagan_tpu.data.synthetic data/synthetic_512 --num 512 \
#       --img_size 512 --num_classes 4
# Reference anchor: /root/reference/sagan/models/layers.py:94-116
# attention semantics, extended to 512px.
output_name = "flash512_smoke"
config = {
    "num_devices": 1,
    "dataset": "synthetic512",
    "data_path": "data/synthetic_512",
    "data_size": -1,
    "model": "vanilla",
    "z_dim": 128,
    "gf_dim": 16,
    "df_dim": 16,
    "lr_g": 2e-4,
    "lr_d": 7e-4,
    "decay_rate": 0.99,
    "use_attention": True,
    "attn_dim_G": [512],   # N=262144 -> flash path, fused backward
    "attn_dim_D": [64],
    "use_label": False,
    "batch_size": 4,
    "loss": "hinge_loss",
    "epoch": 4,
    "update_ratio": 1,
    "compute_dtype": "bfloat16",
    "steps_per_call": 4,
    "use_pallas": True,
    "num_sample": 4,
    "summary_step_freq": 32,
    "log_dir": "logs/{}".format(output_name),
    "ckpt_dir": "checkpoints/{}".format(output_name),
    "img_dir": "images/{}".format(output_name),
}
