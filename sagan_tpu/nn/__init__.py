from . import initializers
from .attention import SelfAttention
from .layers import (BatchNorm, ConditionalBatchNorm, Conv, ConvTranspose,
                     Dense, Embedding, global_sum_pool, leaky_relu, max_pool)
from .module import Ctx, Module
