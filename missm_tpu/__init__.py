"""missm_tpu — a TPU-native missing-multimodality benchmark framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
MissM-Benchmark (PyTorch/DDP/NCCL): five CLIP-style LanguageBind modality
towers (image, video, audio, depth, thermal) plus a text tower, twelve
fusion/imputation heads with modality-dropout masks compiled into the jitted
graph, device-resident preprocessing kernels, and data-parallel training over
a `jax.sharding.Mesh`.

Layout:
  core/      mesh + sharding helpers, PRNG discipline, dtype policy
  ops/       numerical building blocks (attention, layernorm, mel fbank, resize)
  kernels/   Pallas TPU kernels for the hot ops (with XLA fallbacks)
  models/    the parameterized CLIP tower, multi-tower encoder, fusion heads
  parallel/  pjit/shard_map train + eval steps, partition specs
  data/      datasets, missing-mask generation, host-side loaders
  ingest/    C++ decode service bindings (FFmpeg/libjpeg/libpng) + fallbacks
  train/     training loop: optimizer, LR plateau scheduler, EMA, distillation
  eval/      missing-ratio sweep driver + txt report writer
  metrics/   accuracy / macro-F1 / AUC-ovo (sklearn-parity)
  compat/    argparse mirrors of the reference CLIs, HF->JAX weight converter
  cli/       train / test entry points
"""

__version__ = "0.1.0"
