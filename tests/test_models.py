"""Model shape/behavior tests — supersedes the reference's two smoke tests
(/root/reference/test/test_{generator,discriminator}.py) which needed a
real dataset on disk; ours are hermetic and cover both families,
conditional + unconditional, 64 and 128 px."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sagan_tpu.models import get_discriminator, get_generator

KEY = jax.random.PRNGKey(0)


def make_config(**kw):
    cfg = {
        "model": "vanilla",
        "z_dim": 16,
        "gf_dim": 8,
        "df_dim": 8,
        "img_size": 32,
        "use_attention": True,
        "attn_dim_G": [16],
        "attn_dim_D": [8],
        "use_label": False,
        "num_classes": 5,
        "compute_dtype": "float32",
    }
    cfg.update(kw)
    return cfg


@pytest.mark.parametrize("model", ["vanilla", "resnet"])
@pytest.mark.parametrize("use_label", [False, True])
def test_generator_output_shape_and_range(model, use_label):
    cfg = make_config(model=model, use_label=use_label)
    gen = get_generator(cfg)
    v = gen.init(KEY)
    z = jax.random.normal(KEY, (2, 16))
    labels = jnp.array([1, 3])
    img, aux = gen(v, z, labels, train=True)
    assert img.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0
    assert np.all(np.isfinite(np.asarray(img)))


@pytest.mark.parametrize("model", ["vanilla", "resnet"])
@pytest.mark.parametrize("use_label", [False, True])
def test_discriminator_output_shape(model, use_label):
    cfg = make_config(model=model, use_label=use_label)
    disc = get_discriminator(cfg)
    v = disc.init(KEY)
    img = jax.random.normal(KEY, (2, 32, 32, 3))
    labels = jnp.array([0, 4])
    out, _ = disc(v, img, labels, train=True)
    if use_label:
        assert out.shape == (2, 1)
    else:
        assert out.shape == (2, 4, 4, 1)  # PatchGAN map at 4x4
    assert np.all(np.isfinite(np.asarray(out)))


def test_generator_128px_resnet_channel_schedule():
    """Legacy ImageNet-128 config: 5 stages, gf multipliers 16,8,4,2,1
    (/root/reference/models/generator.py:32-37)."""
    cfg = make_config(model="resnet", img_size=128, gf_dim=4,
                      attn_dim_G=[32], use_label=True)
    gen = get_generator(cfg)
    v = gen.init(KEY)
    z = jax.random.normal(KEY, (1, 16))
    img, _ = gen(v, z, jnp.array([0]), train=False)
    assert img.shape == (1, 128, 128, 3)
    # attention inserted at the 32x32 stage
    assert any("attn32" in k for k in v["params"])


def test_vanilla_attention_uses_attn_dim_D_for_discriminator():
    """Regression guard for reference bug A.5 (attn_dim_G misused in D)."""
    cfg = make_config(attn_dim_G=[16], attn_dim_D=[4])
    disc = get_discriminator(cfg)
    v = disc.init(KEY)
    assert any("attn4" in k for k in v["params"])
    assert not any("attn16" in k for k in v["params"])


def test_conditional_bn_generator():
    cfg = make_config(use_label=True, use_cond_bn=True)
    gen = get_generator(cfg)
    v = gen.init(KEY)
    z = jax.random.normal(KEY, (4, 16))
    img0, _ = gen(v, z, jnp.zeros(4, jnp.int32), train=False)
    img1, _ = gen(v, z, jnp.ones(4, jnp.int32), train=False)
    assert not np.allclose(np.asarray(img0), np.asarray(img1))


def test_generator_eval_deterministic():
    cfg = make_config()
    gen = get_generator(cfg)
    v = gen.init(KEY)
    z = jax.random.normal(KEY, (2, 16))
    a, _ = gen(v, z, None, train=False)
    b, _ = gen(v, z, None, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_bfloat16_compute_path():
    cfg = make_config(compute_dtype="bfloat16")
    gen = get_generator(cfg)
    v = gen.init(KEY)
    z = jax.random.normal(KEY, (2, 16))
    img, _ = gen(v, z, None, train=True)
    assert img.dtype == jnp.bfloat16
    # params stay fp32 master copies
    leaves = jax.tree.leaves(v["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_256px_generator_and_train_step():
    """256px path: the ladder extends one stage past the reference's
    maximum (128px) and the 64x64-map attention (N=4096 tokens at
    256px insertion) routes through the fused-kernel dispatch.  A
    G forward plus one full train step must compose at this size —
    the config surface the flash-blocked attention future-proofs."""
    from sagan_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from sagan_tpu.train.optim import make_gan_optimizers
    from sagan_tpu.train.trainer import TrainState, build_train_step

    cfg = make_config(model="resnet", img_size=256, gf_dim=4, df_dim=4,
                      attn_dim_G=[64], attn_dim_D=[64], use_label=True,
                      num_classes=4, use_cond_bn=True,
                      lr_g=2e-4, lr_d=7e-4, decay_rate=0.99,
                      update_ratio=1, loss="hinge_loss",
                      global_batch_size=8)
    gen = get_generator(cfg)
    disc = get_discriminator(cfg)
    v = gen.init(KEY)
    z = jax.random.normal(KEY, (2, 16))
    img, _ = gen(v, z, jnp.array([0, 1]), train=False)
    assert img.shape == (2, 256, 256, 3)
    assert np.all(np.isfinite(np.asarray(img)))

    mesh = make_mesh(2)
    (opt_g, _), (opt_d, _) = make_gan_optimizers(cfg, steps_per_epoch=4)
    vars_d = disc.init(jax.random.fold_in(KEY, 1))
    state = TrainState(
        vars_g=v, vars_d=vars_d,
        opt_g=opt_g.init(v["params"]),
        opt_d=opt_d.init(vars_d["params"]),
        step=jnp.int32(0), rng=jax.random.fold_in(KEY, 2))
    state = replicate(mesh, state)
    step = build_train_step(gen, disc, opt_g, opt_d, cfg, mesh)
    rng = np.random.default_rng(0)
    im, lb = shard_batch(
        mesh, rng.integers(0, 255, (8, 256, 256, 3), dtype=np.uint8),
        rng.integers(0, 4, (8,), dtype=np.int32))
    state, metrics = step(state, im, lb)
    assert np.isfinite(float(metrics["G_loss"]))
    assert np.isfinite(float(metrics["D_loss"]))


@pytest.mark.parametrize("model", ["vanilla", "resnet"])
def test_attention_knobs_reach_both_model_families(model):
    """Regression: the resnet family used to drop use_pallas /
    attn_downsample on the floor, so the trainer's GSPMD guard
    (use_pallas=False for model_parallel runs) was silently ignored for
    the pod configs and attn_downsample=False built a different
    architecture than requested."""
    cfg = make_config(model=model, img_size=32, gf_dim=8, df_dim=8,
                      attn_dim_G=[16], attn_dim_D=[16],
                      use_label=(model == "resnet"),
                      use_pallas=False, attn_downsample=False)
    for net in (get_generator(cfg), get_discriminator(cfg)):
        attns = [m for name, m in net.named_modules()
                 if "attn" in name] if hasattr(net, "named_modules") else []
        if not attns:  # fall back to a scan over attributes
            from sagan_tpu.nn.attention import SelfAttention

            def collect(mod, out):
                for v in mod.__dict__.values():
                    if isinstance(v, SelfAttention):
                        out.append(v)
                    elif hasattr(v, "__dict__") and hasattr(v, "init"):
                        collect(v, out)
                return out
            attns = collect(net, [])
            for blocks in getattr(net, "blocks", []):
                for item in (blocks if isinstance(blocks, tuple) else ()):
                    if isinstance(item, SelfAttention):
                        attns.append(item)
        assert attns, f"no attention modules found in {model}"
        for a in attns:
            assert a.use_pallas is False
            assert a.downsample is False


def test_config_space_property_sweep():
    """Property sweep: every valid config combination in a sampled grid
    builds both networks and runs a finite forward — guards the shape
    logic (attention insertion points, cond-BN gating, label concat,
    PatchGAN vs projection heads) across the whole config space rather
    than a few hand-picked cases."""
    import itertools

    rng = np.random.default_rng(7)
    cases = list(itertools.product(
        ("vanilla", "resnet"),          # model
        (16, 32),                       # img_size
        (False, True),                  # use_label
        (False, True),                  # attention
    ))
    for model, img_size, use_label, attn in cases:
        sides = [img_size // (2 ** i) for i in range(1, 3)]
        cfg = make_config(
            model=model, img_size=img_size, gf_dim=8, df_dim=8,
            use_label=use_label, use_cond_bn=use_label,
            use_attention=attn,
            attn_dim_G=[rng.choice(sides)] if attn else [],
            attn_dim_D=[rng.choice(sides)] if attn else [])
        gen = get_generator(cfg)
        disc = get_discriminator(cfg)
        vg = gen.init(KEY)
        vd = disc.init(jax.random.fold_in(KEY, 1))
        z = jax.random.normal(KEY, (2, 16))
        labels = jnp.array([0, 3])
        img, _ = gen(vg, z, labels, train=True)
        out, _ = disc(vd, img, labels, train=True)
        assert img.shape == (2, img_size, img_size, 3), (model, img_size)
        assert np.isfinite(np.asarray(img)).all(), (model, img_size)
        assert np.isfinite(np.asarray(out)).all(), (model, img_size)


@pytest.mark.parametrize("model", ["vanilla", "resnet"])
def test_attn_dim_overrides_propagate(model):
    """attn_qk_dim/attn_v_dim reach every attention module in both
    families (all four construction sites) and the nets still run."""
    from sagan_tpu.nn.attention import SelfAttention

    cfg = make_config(model=model, attn_qk_dim=32, attn_v_dim=16,
                      use_label=(model == "resnet"))

    def collect(mod, out):
        for v in mod.__dict__.values():
            if isinstance(v, SelfAttention):
                out.append(v)
            elif hasattr(v, "__dict__") and hasattr(v, "init"):
                collect(v, out)
        for blocks in getattr(mod, "blocks", []):
            for item in (blocks if isinstance(blocks, tuple) else ()):
                if isinstance(item, SelfAttention):
                    out.append(item)
        return out

    for net, run in ((get_generator(cfg), "g"), (get_discriminator(cfg),
                                                 "d")):
        attns = collect(net, [])
        assert attns, f"no attention modules found in {model} {run}"
        for a in attns:
            assert a.qk_dim == 32 and a.v_dim == 16
        v = net.init(KEY)
        if run == "g":
            out, _ = net(v, jax.random.normal(KEY, (2, 16)),
                         jnp.array([1, 3]), train=True)
        else:
            out, _ = net(v, jax.random.normal(KEY, (2, 32, 32, 3)),
                         jnp.array([1, 3]), train=True)
        assert np.all(np.isfinite(np.asarray(out)))
