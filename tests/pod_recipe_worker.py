"""Subprocess worker: run the shipped pod recipe at toy scale on a wide
virtual CPU mesh (driven by tests/test_train.py::
test_pod_recipe_32_wide_subprocess).

Loads the real ``example_configs/biggan128_pod.py`` and overrides only
scale knobs (synthetic 16px data, tiny widths) — the *mechanisms* under
test are exactly the config's: conditional ResNet, update_ratio 2, EMA,
steps_per_call fusion, plus the documented pod options
``model_parallel`` (dp x tp GSPMD mesh) and ``grad_accum_steps``.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main(num_devices: int) -> None:
    from sagan_tpu.data.synthetic import make_synthetic_dataset
    from sagan_tpu.train.trainer import Trainer
    from sagan_tpu.utils.config import load_config_file, resolve_config

    assert len(jax.devices()) == num_devices, jax.devices()
    tmp = tempfile.mkdtemp(prefix="pod_recipe_")
    data = make_synthetic_dataset(tmp + "/ds", num=1024, img_size=16,
                                  num_classes=4, seed=0)
    cfg = load_config_file("example_configs/biggan128_pod.py")
    cfg.update({
        # scale-only overrides; every mechanism key stays as shipped
        "dataset": "synthetic", "data_path": data, "data_size": -1,
        "z_dim": 16, "gf_dim": 8, "df_dim": 8,
        "attn_dim_G": [8], "attn_dim_D": [8],
        "epoch": 1, "compute_dtype": "float32",
        "num_sample": 4, "fid_epoch_freq": 0, "num_devices": None,
        "model_parallel": 2, "grad_accum_steps": 2, "steps_per_call": 2,
        "log_dir": tmp + "/logs", "ckpt_dir": tmp + "/ckpt",
        "img_dir": tmp + "/imgs", "print_variables": False,
    })
    cfg = resolve_config(cfg, num_local_devices=num_devices)
    assert cfg["global_batch_size"] == 8 * (num_devices // 2), cfg
    tr = Trainer(cfg)
    tr.train(num_epochs=1)
    print(f"pod recipe ok: mesh {tr.mesh.shape} step {tr.global_step()}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]))
