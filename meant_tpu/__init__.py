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

# Persistent XLA compilation cache: on the tunneled-TPU platform a cold
# compile of a big graph goes through a remote compile service (minutes);
# the cache cuts warm process starts ~3.6x (measured: 192s -> 53s).
# Opt out with MEANT_TPU_NO_COMPILE_CACHE=1 or point MEANT_TPU_CACHE_DIR
# elsewhere.
import os as _os

if not _os.environ.get("MEANT_TPU_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # per-platform cache dir: entries serialized by one backend abort
        # deserialization on another (observed axon <-> cpu), and the axon
        # plugin's keys may not fingerprint the platform
        _plat = _os.environ.get("JAX_PLATFORMS", "default") or "default"
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "MEANT_TPU_CACHE_DIR",
                _os.path.expanduser(
                    f"~/.cache/meant_tpu/xla_cache_{_plat}")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:  # older jax without the knobs
        pass
