"""Classifier training harness — rebuild of `in_loop_train.py:379-725` with
the same flag names. TPU-native: mesh data-parallel, bf16, orbax checkpoints.

Data: --data_dir pointing at the TempStock `.npy` arrays
(`in_loop_train.py:589-593` naming) or Stocknet-style CSVs; when omitted, a
synthetic TempStock-shaped set runs a smoke pass end-to-end.

Pretrained grafting: --pretrained loads encoder stacks from
`{file_path}/models/meant_language_encoder_{nec}...` orbax checkpoints into
the fresh model (`in_loop_train.py:496-507` workflow).
"""

from __future__ import annotations

import time

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser, build_model
from meant_tpu.data import (ArrayLoader, load_tempstock_small, split_arrays,
                            synthetic_tempstock)
from meant_tpu.parallel import make_mesh
from meant_tpu.train import meant_trainer
from meant_tpu.train import checkpoint as ckpt


def main(argv=None):
    args = base_parser().parse_args(argv)
    t0 = time.time()

    model = build_model(args)

    if args.data_dir:
        arrays = load_tempstock_small(args.data_dir,
                                      lag_suffix=f"_{args.lag}",
                                      normalize=args.normalize)
    else:
        print("No --data_dir given: running on synthetic TempStock-shaped "
              "data (smoke mode).")
        arrays = synthetic_tempstock(n=args.synthetic_n, lag=args.lag,
                                     seq=args.seq_len, channels=4,
                                     size=args.image_size,
                                     vocab=args.vocab_size - 1)
    if args.image_only and args.language_only:
        raise AssertionError(
            "Cannot be an image only AND a language only task")
    train, val, test = split_arrays(arrays)

    if args.buckets:
        # length-bucketed training batches (one jit compile per bucket —
        # the static-shape equivalent of the reference's dynamic padding)
        from meant_tpu.data.loader import BucketedLoader
        buckets = tuple(int(x) for x in args.buckets.split(","))
        train_loader = BucketedLoader(
            train, args.train_batch_size, buckets=buckets, shuffle=True,
            seq_keys=("tweets", "input_ids", "attention_masks"))
    else:
        train_loader = ArrayLoader(train, args.train_batch_size,
                                   shuffle=True)

    trainer = meant_trainer({
        "model": model, "model_name": args.model_name,
        "dataset": args.dataset,
        "train_loader": train_loader,
        "val_loader": ArrayLoader(val, args.train_batch_size,
                                  drop_remainder=False),
        "test_loader": ArrayLoader(test, args.train_batch_size,
                                   drop_remainder=False),
        "epochs": args.num_epochs, "epoch": args.epoch,
        "num_classes": args.num_classes, "lag": args.lag,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders,
        "optimizer": args.optimizer, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "early_stopping": args.early_stopping,
        "test_model": args.test_model, "track": args.track,
        "seed": args.seed, "mesh": make_mesh(),
        "fsdp": args.fsdp,
        "mu_dtype": jnp.bfloat16 if args.mu_bf16 else None,
    })

    if args.hf_cache:
        # the reference's from_pretrained init (`in_loop_train.py:440-507`)
        # from a LOCAL cache: bertweet embeddings into meant-family models,
        # full backbones (+ bertweet word-embedding swap) for the HF
        # wrappers. File formats (safetensors/bin/sharded) are parsed by
        # utils/hf_cache; the importers in utils/port map to flax params.
        from meant_tpu.utils.hf_cache import hf_graft
        batch = next(iter(trainer.train_loader))
        trainer._init_state(batch)
        grafted = hf_graft(args.model_name, dict(trainer.state.params),
                           args.num_encoders, cache_dir=args.hf_cache)
        trainer.init_params = grafted
        trainer.state = None  # re-init with the pretrained params
        print(f"initialized {args.model_name} from local HF cache "
              f"{args.hf_cache}")

    if args.pretrained and args.pretrained_model:
        restored = ckpt.restore(args.pretrained_model)
        batch = next(iter(trainer.train_loader))
        trainer._init_state(batch)
        grafted = ckpt.graft(dict(trainer.state.params),
                             restored["params"])
        trainer.init_params = grafted
        trainer.state = None  # re-init with grafted params

    results = trainer.train()
    print("total time:", time.time() - t0)
    return results


if __name__ == "__main__":
    main()
