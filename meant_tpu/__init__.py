"""meant_tpu — a TPU-native JAX/Flax/Pallas framework with the capability set of
the MEANT research codebase (biirving/meant).

Layering (see SURVEY.md §7):
  ops/       pure-functional numerics: rotary/xPos embeddings, RMSNorm,
             attention variants (XLA reference impls + Pallas flash kernels),
             temporal antecedent-lag attention.
  nn/        Flax linen building blocks: encoder blocks, HF-style embeddings,
             TimeSformer.
  models/    the MEANT model zoo (public constructors mirror the reference).
  parallel/  mesh construction + sharding rules (DP over ICI via psum).
  train/     optimizers/schedules, jitted train steps, trainers, orbax
             checkpointing + encoder grafting.
  data/      fixed-shape lag datasets, masking (MLM/CLM/MIM), MACD/RSI
             labeling, SMOTE — all numpy, streaming into HBM.
  utils/     device-side metrics, config.
  cli/       argparse harnesses with reference-compatible flag names.
"""

__version__ = "0.1.0"
