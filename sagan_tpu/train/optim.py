"""TTUR optimizer pair: two Adams with staircase exponential LR decay.

Reference semantics (/root/reference/sagan/main.py:111-120):
  * Adam(beta_1=0) for both nets (the zero-momentum GAN Adam);
  * separate learning rates lr_g / lr_d (TTUR, e.g. 2e-4 / 7e-4);
  * ExponentialDecay(staircase=True): G decays every ``steps_per_epoch``
    optimizer steps, D every ``steps_per_epoch * update_ratio`` (D takes
    ``update_ratio`` optimizer steps per global step, so both decay once
    per epoch).
TF-Keras Adam defaults are matched: beta_2=0.999, eps=1e-7.  One
update-rule difference (documented, not replicated): TF applies eps to
the *uncorrected* sqrt(v) with a bias-corrected lr — an effective
eps/sqrt(1-beta2^t) against v_hat, ~32x ours at step 1, converging to
eps — while optax adds eps to sqrt(v_hat).  At eps=1e-7 this only
touches parameters whose second moment is itself at eps scale, and
decays within the first epochs; not worth a custom transform
(PARITY.md "Documented semantic deviations").
"""

from __future__ import annotations

import optax


def exponential_decay_staircase(init_value: float, transition_steps: int,
                                decay_rate: float):
    return optax.exponential_decay(
        init_value=init_value,
        transition_steps=max(1, transition_steps),
        decay_rate=decay_rate,
        staircase=True,
    )


def make_optimizer(lr: float, steps_per_decay: int, decay_rate: float,
                   b1: float = 0.0, b2: float = 0.999, eps: float = 1e-7):
    schedule = exponential_decay_staircase(lr, steps_per_decay, decay_rate)
    return optax.adam(schedule, b1=b1, b2=b2, eps=eps), schedule


def make_gan_optimizers(config: dict, steps_per_epoch: int):
    """Returns ((opt_G, sched_G), (opt_D, sched_D))."""
    decay = config.get("decay_rate", 1.0)
    update_ratio = config.get("update_ratio", 1)
    opt_g = make_optimizer(config["lr_g"], steps_per_epoch, decay)
    opt_d = make_optimizer(config["lr_d"], steps_per_epoch * update_ratio,
                           decay)
    return opt_g, opt_d
