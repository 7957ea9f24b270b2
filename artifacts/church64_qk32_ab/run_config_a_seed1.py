# Head-width A/B, arm A (reference widths): VERDICT r4 item 5 —
# round 4 built the attn_qk_dim/attn_v_dim lever and measured its COST
# (+11-22% step time, tools/bench_attn_qk.py) but never its BENEFIT.
# This pair trains the church64 TFRecord workflow (structured JPEG
# dataset, artifacts/church64_tfrecord/make_dataset.py) to equal epochs
# with identical seeds/recipe, differing ONLY in the attention head
# widths, and compares the proxy-FID trend + sample grids.
#
#   arm A: reference widths (qk = c/8, v = c/2 —
#          /root/reference/layers.py:89-99 semantics)
#   arm B: attn_qk_dim 32 (run_config_b.py)
#
# Dataset (hermetic):
#   python artifacts/church64_tfrecord/make_dataset.py /tmp/church64_images \
#       --num_per_class 1500 --classes 8 --src_size 96
#   python -m sagan_tpu.data.convert --path /tmp/church64_images \
#       --dataset imagenet --img_size 64 --n_class 8 \
#       --out_dir data/church64_tfrecord
output_name = "church64_qk_a2"
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
    "epoch": 30,
    "seed": 1,
    "update_ratio": 1,
    "g_ema_decay": 0.999,
    "g_ema_start": 1000,
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
