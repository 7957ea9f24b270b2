from .attention import attention, attention_reference
from .losses import bce_d, bce_g, get_loss, hinge_d, hinge_g
from .spectral import exact_sigma, power_iterate, spectral_normalize
