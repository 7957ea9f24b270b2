"""Offline evaluation CLI: checkpoint → FID (+ Inception Score).

The reference computes FID only inside the (disabled) training loop
(/root/reference/sagan/main.py:39-84,271-273) and has no offline
entry point; this CLI evaluates any trained run without touching its
training state: restore the latest checkpoint (EMA generator when the
run tracked one), compute FID against the config's dataset, optionally
the Inception Score, and print one JSON line.

    python -m sagan_tpu.evaluate --config_path example_configs/foo.py \
        [--num_images 5000] [--no_is]

Extractor/classifier backends follow the training-loop plumbing
(train/fid.py, train/iscore.py): the JAX InceptionV3 port when
``inception_weights`` points at an exported npz, the deterministic
random-feature proxy otherwise (documented in PARITY.md — proxy scales
are not comparable to published numbers, but are stable regression
signals).
"""

from __future__ import annotations

import argparse
import json

from .utils.cache import enable_compilation_cache

enable_compilation_cache()


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="evaluate FID / Inception Score for a trained run")
    ap.add_argument("--config_path", required=True)
    ap.add_argument("--num_images", type=int, default=None,
                    help="sample count (default: config fid_num_images)")
    ap.add_argument("--no_is", action="store_true",
                    help="skip the Inception Score")
    ap.add_argument("--raw_g", action="store_true",
                    help="evaluate the raw (non-EMA) generator even when "
                         "the run tracked an EMA — quantifies what the "
                         "EMA buys from one checkpoint")
    args = ap.parse_args(argv)

    import sys

    from .utils.device import wait_for_devices
    # heartbeat to stderr: this CLI's stdout ends with one JSON result
    wait_for_devices(stream=sys.stderr)

    from .train.fid import compute_fid_for_trainer, get_extractor
    from .train.trainer import Trainer
    from .utils.config import load_config_file, resolve_config

    config = resolve_config(load_config_file(args.config_path))
    # evaluation never trains: keep construction light and quiet
    config["print_variables"] = False
    trainer = Trainer(config)
    # the Trainer merges dataset metadata (img_size, num_classes, …)
    # into ITS copy — the raw file config lacks img_size unless the
    # user spelled it out, and the extractor/classifier need it
    config = trainer.config
    step = trainer.global_step()
    if step == 0:
        raise SystemExit(
            f"no trained checkpoint under {config.get('ckpt_dir')!r} — "
            f"train first (python -m sagan_tpu.main --config_path ...)")

    if args.raw_g and trainer.state.ema_g is not None:
        # eval_vars_g() returns EMA params whenever ema_g is tracked;
        # dropping it from the (host-side) state forces the raw net
        trainer.state = trainer.state._replace(ema_g=None)

    fid_n = args.num_images or config.get("fid_num_images", 5000)
    # Label the backend ACTUALLY instantiated (get_extractor falls back
    # to the random-feature proxy when the configured weights are
    # missing/unusable — config intent must not be reported as fact),
    # and name the metric KEY by it: a proxy number under the key "fid"
    # reads as real FID to anyone skimming the JSON, so the proxy
    # extractor reports "proxy_fid"/"proxy_inception_score" instead.
    extractor = get_extractor(config)
    real_fid = extractor.backend == "inception"
    result = {
        "step": step,
        "ema": trainer.state.ema_g is not None,
        "num_images": fid_n,
        "extractor": extractor.backend,
    }
    fid_key = "fid" if real_fid else "proxy_fid"
    result[fid_key] = float(compute_fid_for_trainer(
        trainer, num_images=fid_n, extractor=extractor))
    if not real_fid:
        result["proxy_fid_note"] = ("random-feature proxy: stable "
                                    "regression signal, NOT comparable "
                                    "to published FID numbers")
    if not args.no_is:
        from .train.iscore import get_classifier, inception_score_for_trainer
        # --num_images overrides; otherwise the IS sample count follows
        # its own config key (is_num_images, falling back to
        # fid_num_images) — report the count actually used
        is_n = args.num_images or config.get("is_num_images", fid_n)
        classifier = get_classifier(config)
        is_mean, is_std = inception_score_for_trainer(
            trainer, num_images=is_n, classifier=classifier)
        result["is_num_images"] = is_n
        result["is_classifier"] = classifier.backend
        is_key = ("inception_score" if classifier.backend == "inception"
                  else "proxy_inception_score")
        result[is_key] = round(float(is_mean), 4)
        result[is_key + "_std"] = round(float(is_std), 4)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
