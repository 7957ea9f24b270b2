"""Sampling/serving CLI tests: checkpoint restore (with and without EMA),
batched jitted generation, truncation trick, PNG/npz outputs."""

import os

import numpy as np
import pytest

from sagan_tpu.data.synthetic import make_synthetic_dataset
from sagan_tpu.train.trainer import Trainer
from sagan_tpu.utils.config import resolve_config


def _train_tiny(tmp_path, **extra):
    data = make_synthetic_dataset(str(tmp_path / "ds"), num=32, img_size=16,
                                  num_classes=4, seed=1)
    cfg = resolve_config({
        "dataset": "synthetic", "data_path": data, "model": "vanilla",
        "z_dim": 8, "gf_dim": 8, "df_dim": 8, "lr_g": 2e-4, "lr_d": 7e-4,
        "decay_rate": 0.99, "use_attention": True, "attn_dim_G": [8],
        "attn_dim_D": [8], "use_label": False, "batch_size": 2,
        "loss": "hinge_loss", "epoch": 1, "update_ratio": 1,
        "num_sample": 4, "summary_step_freq": 100, "data_size": -1,
        "compute_dtype": "float32", "seed": 0, "num_devices": 8,
        "ckpt_dir": str(tmp_path / "ckpt"), **extra,
    }, num_local_devices=8)
    tr = Trainer(cfg)
    tr.train(num_epochs=1)
    if tr.ckpt_mgr:
        tr.ckpt_mgr.wait()
    return tr.config  # includes the metadata-merged img_size/num_classes


def test_generate_cli_end_to_end(tmp_path):
    cfg = _train_tiny(tmp_path)
    from sagan_tpu import generate

    gen, eval_vars = generate.restore_eval_state(cfg)
    imgs = generate.sample_images(gen, eval_vars, num=6, batch=4,
                                  z_dim=cfg["z_dim"], num_classes=1, seed=3)
    assert imgs.shape == (6, 16, 16, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0

    # CLI main(): write a config file, run png+npz
    cfg_file = tmp_path / "gen_cfg.py"
    cfg_file.write_text(f"config = {cfg!r}\n")
    out = str(tmp_path / "samples")
    written = generate.main([
        "--config_path", str(cfg_file), "--num", "4", "--batch", "4",
        "--out", out, "--format", "both"])
    assert len(written) == 2
    for path in written:
        assert os.path.exists(path)
    data = np.load(written[1])
    assert data["images"].shape == (4, 16, 16, 3)
    assert data["images"].dtype == np.uint8


def test_serve_uint8_matches_host_denormalize(tmp_path):
    """Device-side uint8 serving path (build_serve_fn) equals the float
    sample path + host denormalize within 1 LSB (f32 rounding of values
    landing exactly on integer boundaries may differ XLA vs numpy)."""
    cfg = _train_tiny(tmp_path)
    from sagan_tpu import generate
    from sagan_tpu.utils.images import denormalize

    gen, eval_vars = generate.restore_eval_state(cfg)
    kw = dict(z_dim=cfg["z_dim"], num_classes=1, seed=7)
    f = generate.sample_images(gen, eval_vars, num=6, batch=4, **kw)
    u = generate.sample_images(gen, eval_vars, num=6, batch=4,
                               as_uint8=True, **kw)
    assert u.dtype == np.uint8 and u.shape == f.shape
    diff = np.abs(u.astype(np.int16) - denormalize(f).astype(np.int16))
    assert diff.max() <= 1


def test_make_grid_accepts_uint8():
    from sagan_tpu.utils.images import denormalize, make_grid

    rng = np.random.default_rng(0)
    f = rng.uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
    assert np.array_equal(make_grid(denormalize(f)), make_grid(f))


def test_generate_truncation_narrows_latents(tmp_path):
    cfg = _train_tiny(tmp_path)
    from sagan_tpu import generate

    gen, eval_vars = generate.restore_eval_state(cfg)
    wide = generate.sample_images(gen, eval_vars, num=8, batch=8,
                                  z_dim=cfg["z_dim"], num_classes=1,
                                  seed=0, truncation=0.0)
    tight = generate.sample_images(gen, eval_vars, num=8, batch=8,
                                   z_dim=cfg["z_dim"], num_classes=1,
                                   seed=0, truncation=0.3)
    assert np.isfinite(tight).all()
    # truncated latents concentrate the outputs: per-pixel spread shrinks
    assert tight.std() < wide.std() * 1.5  # sanity bound, not flaky-tight
    assert not np.allclose(wide, tight)


def test_generate_uses_ema_when_tracked(tmp_path, capsys):
    cfg = _train_tiny(tmp_path, g_ema_decay=0.9)
    from sagan_tpu import generate

    gen, eval_vars = generate.restore_eval_state(cfg)
    assert "(EMA generator)" in capsys.readouterr().out
    imgs = generate.sample_images(gen, eval_vars, num=2, batch=2,
                                  z_dim=cfg["z_dim"], num_classes=1)
    assert np.isfinite(imgs).all()


def test_generate_missing_checkpoint_friendly_error(tmp_path):
    from sagan_tpu import generate

    with pytest.raises(FileNotFoundError, match="train first"):
        generate.restore_eval_state({"ckpt_dir": str(tmp_path / "nope"),
                                     "z_dim": 8})


def test_export_weights_round_trip(tmp_path):
    """--export writes a standalone npz; --weights samples from it with
    outputs identical to the checkpoint path (the serving deployment
    format: config + one flat numpy archive, no Orbax tree)."""
    cfg = _train_tiny(tmp_path)
    from sagan_tpu import generate

    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(f"config = {cfg!r}\n")
    npz = str(tmp_path / "g.npz")
    written = generate.main(
        ["--config_path", str(cfg_file), "--export", npz])
    assert written == [npz] and os.path.exists(npz)

    gen_a, vars_a = generate.restore_eval_state(cfg)
    gen_b, vars_b = generate.load_generator_npz(cfg, npz)
    a = generate.sample_images(gen_a, vars_a, num=4, batch=4,
                               z_dim=cfg["z_dim"], num_classes=1, seed=5)
    b = generate.sample_images(gen_b, vars_b, num=4, batch=4,
                               z_dim=cfg["z_dim"], num_classes=1, seed=5)
    np.testing.assert_array_equal(a, b)

    # architecture mismatch is a loud error, not silent garbage
    import pytest
    with pytest.raises((KeyError, ValueError)):
        generate.load_generator_npz(dict(cfg, gf_dim=16), npz)

    # serving-box contract: config WITHOUT img_size/num_classes (no
    # metadata-merge) + the npz alone must sample — the export embeds
    # the geometry, so no dataset/metadata.pickle exists on the box
    bare = {k: v for k, v in cfg.items()
            if k not in ("img_size", "num_classes", "num_records")}
    bare["data_path"] = str(tmp_path / "nonexistent")
    bare_file = tmp_path / "bare_cfg.py"
    bare_file.write_text(f"config = {bare!r}\n")
    out = generate.main([
        "--config_path", str(bare_file), "--weights", npz,
        "--num", "4", "--batch", "4",
        "--out", str(tmp_path / "serve_out"), "--format", "npz"])
    assert len(out) == 1 and os.path.exists(out[0])

    # out-of-range --class_id errors instead of silently clamping
    with pytest.raises(SystemExit, match="class_id"):
        generate.main([
            "--config_path", str(bare_file), "--weights", npz,
            "--class_id", "207", "--num", "4", "--batch", "4",
            "--out", str(tmp_path / "serve_out2")])


def test_generate_specific_step(tmp_path):
    """--step restores a pinned checkpoint; a missing step raises."""
    cfg = _train_tiny(tmp_path)
    from sagan_tpu import generate
    from sagan_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(cfg["ckpt_dir"])
    steps = sorted(mgr.mgr.all_steps())
    mgr.close()
    gen, vars_s = generate.restore_eval_state(cfg, step=steps[0])
    imgs = generate.sample_images(gen, vars_s, num=2, batch=2,
                                  z_dim=cfg["z_dim"], num_classes=1)
    assert np.isfinite(imgs).all()
    import pytest
    with pytest.raises(KeyError, match="no checkpoint at step"):
        generate.restore_eval_state(cfg, step=999999)
