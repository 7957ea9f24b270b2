"""sagan_tpu — a TPU-native (JAX/XLA/Pallas) Self-Attention GAN framework.

A from-scratch rebuild of the capabilities of
jimmYA-1995/Self-Attention-GAN (TF2) designed TPU-first:

* pure-functional module core with explicit {params, aux} pytrees
  (``sagan_tpu.nn``) — no mutable layer state;
* real spectral normalization and fused Pallas self-attention
  (``sagan_tpu.ops``);
* 'vanilla' and 'resnet' G/D families (``sagan_tpu.models``);
* shard_map data parallelism over an ICI mesh with cross-replica
  BatchNorm and pmean gradient reduction (``sagan_tpu.parallel``);
* TFRecord-compatible data pipeline with a native C++ record reader
  (``sagan_tpu.data``);
* TTUR hinge-loss trainer, Orbax checkpointing, TensorBoard-format
  event writing, FID evaluation (``sagan_tpu.train``);
* the reference's ``main.py --config_path example_configs/*.py`` CLI
  (``sagan_tpu.main``).
"""

__version__ = "0.1.0"
