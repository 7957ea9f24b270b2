"""CLI entry point — same surface as the reference:

    python -m sagan_tpu.main --config_path example_configs/church64_attn.py

(/root/reference/sagan/main.py:350-372; ``--debug`` truncates the run.)
"""

from __future__ import annotations


def main(argv=None):
    from .utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from .train.trainer import Trainer
    from .utils.config import get_parameters, load_config_file, resolve_config

    args = get_parameters(argv)
    config = load_config_file(args.config_path)

    from .utils.device import wait_for_devices
    wait_for_devices()
    if args.debug:
        config["data_size"] = min(
            config.get("data_size", -1) if config.get("data_size", -1) > 0
            else 10**9, 2000)
        config["epoch"] = min(config.get("epoch", 1), 2)
        # no checkpoints under --debug (the reference guards its save on
        # `not config['debug']`, sagan/main.py:284): a truncated smoke
        # run must never write into — or later be restored by — the
        # production checkpoint directory
        config["ckpt_dir"] = None
    config = resolve_config(config)

    from pprint import pprint
    pprint(config)

    trainer = Trainer(config)
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
