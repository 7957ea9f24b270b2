"""Model registry — mirrors the reference's selection by
``config['model']`` (/root/reference/sagan/main.py:102-109), with the
'resnet' family *enabled* (the reference gates it off behind a TODO
because its implementation is broken; ours is repaired — see resnet.py).
"""

from .resnet import ResDiscriminator, ResGenerator
from .vanilla import Discriminator, Generator


def _configure_sn(model, config):
    if config.get("use_pallas_sn"):
        from ..nn.layers import set_sn_backend
        set_sn_backend(model, "pallas",
                       interpret=config.get("pallas_interpret", False))
    return model


def get_generator(config):
    model = config.get("model", "vanilla")
    if model == "vanilla":
        return _configure_sn(Generator(config), config)
    if model == "resnet":
        return _configure_sn(ResGenerator(config), config)
    raise ValueError(f"Unsupported model type: {model!r}")


def get_discriminator(config):
    model = config.get("model", "vanilla")
    if model == "vanilla":
        return _configure_sn(Discriminator(config), config)
    if model == "resnet":
        return _configure_sn(ResDiscriminator(config), config)
    raise ValueError(f"Unsupported model type: {model!r}")
