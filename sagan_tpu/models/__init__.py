"""Model registry — mirrors the reference's selection by
``config['model']`` (/root/reference/sagan/main.py:102-109), with the
'resnet' family *enabled* (the reference gates it off behind a TODO
because its implementation is broken; ours is repaired — see resnet.py).
"""

from .resnet import ResDiscriminator, ResGenerator
from .vanilla import Discriminator, Generator


def get_generator(config):
    model = config.get("model", "vanilla")
    if model == "vanilla":
        return Generator(config)
    if model == "resnet":
        return ResGenerator(config)
    raise ValueError(f"Unsupported model type: {model!r}")


def get_discriminator(config):
    model = config.get("model", "vanilla")
    if model == "vanilla":
        return Discriminator(config)
    if model == "resnet":
        return ResDiscriminator(config)
    raise ValueError(f"Unsupported model type: {model!r}")
