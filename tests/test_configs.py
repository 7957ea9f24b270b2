"""Every shipped example config must load, resolve, and construct its
models — catches key-schema drift the moment a config or a model
constructor changes (the config dict contract is the mandated-
compatible API surface, SURVEY.md §5)."""

import glob
import os

import pytest

from sagan_tpu.models import get_discriminator, get_generator
from sagan_tpu.utils.config import load_config_file, resolve_config

CONFIGS = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "example_configs", "*.py")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p)
                                               for p in CONFIGS])
def test_example_config_resolves_and_builds(path):
    cfg = resolve_config(load_config_file(path), num_local_devices=8)
    # geometry normally merged from dataset metadata at train time
    cfg.setdefault("img_size", 64 if "64" in path else 128)
    cfg.setdefault("num_classes", 1000 if cfg.get("use_label") else 1)
    if "512" in os.path.basename(path):
        cfg["img_size"] = 512
    elif "256" in os.path.basename(path):
        cfg["img_size"] = 256
    gen = get_generator(cfg)
    disc = get_discriminator(cfg)
    assert gen is not None and disc is not None
    # global-batch derivation stays consistent
    assert cfg["global_batch_size"] == cfg["batch_size"] * \
        (cfg.get("num_devices") or 8)


def test_flagship_configs_ship_best_practice():
    """EMA on + delayed start in every flagship config (VERDICT r3
    items 3/6); the paper-scale config ships the measured gentle
    recipe, not the saturating one."""
    flagships = ["church64_attn.py", "imagenet128_cond.py",
                 "imagenet128_paper_gf64.py", "church512_attn.py"]
    for name in flagships:
        cfg = load_config_file(os.path.join(
            os.path.dirname(__file__), "..", "example_configs", name))
        assert cfg.get("g_ema_decay", 0) > 0, name
        assert cfg.get("g_ema_start", 0) > 0, name
    gentle = load_config_file(os.path.join(
        os.path.dirname(__file__), "..", "example_configs",
        "imagenet128_paper_gf64.py"))
    assert gentle["lr_d"] <= 1e-4 and gentle["update_ratio"] == 1
