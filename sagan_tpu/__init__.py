"""sagan_tpu — a TPU-native (JAX/XLA/Pallas) Self-Attention GAN framework.

A from-scratch rebuild of the capabilities of
jimmYA-1995/Self-Attention-GAN (TF2) designed TPU-first:

* pure-functional module core with explicit {params, aux} pytrees
  (``sagan_tpu.nn``) — no mutable layer state;
* real spectral normalization and fused Pallas self-attention
  (``sagan_tpu.ops``);
* 'vanilla' and 'resnet' G/D families (``sagan_tpu.models``);
* shard_map data parallelism with cross-replica BatchNorm and pmean
  gradient reduction, GSPMD tensor parallelism (``model_parallel``),
  gradient accumulation, and multi-host (DCN) meshes
  (``sagan_tpu.parallel``);
* TFRecord-compatible data pipeline with a native C++ record reader
  (``sagan_tpu.data``);
* TTUR hinge-loss trainer with EMA, preemption-safe exact resume,
  corruption-tolerant Orbax checkpointing, TensorBoard-format event
  writing, FID + Inception Score evaluation (``sagan_tpu.train``);
* the reference's ``main.py --config_path example_configs/*.py`` CLI
  (``sagan_tpu.main``), offline evaluation (``sagan_tpu.evaluate``),
  and sampling/serving with standalone weight export
  (``sagan_tpu.generate``).
"""

__version__ = "0.2.0"
