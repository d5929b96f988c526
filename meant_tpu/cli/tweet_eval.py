"""tweet_eval-style text-classification fine-tune — rebuild of the `src/hug`
suite's `tweet7.py` (7-way tweet_eval classification on a bertweet
backbone). Data: --data_dir with a CSV (`text`, `label` columns); synthetic
in smoke mode."""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser, reject_stack_flags
from meant_tpu.data import ArrayLoader
from meant_tpu.models import bertweet_wrapper
from meant_tpu.native import fnv1a_tokenize
from meant_tpu.parallel import make_mesh
from meant_tpu.train.text_classify import text_classifier_trainer


def load_data(args):
    if args.data_dir:
        import pandas as pd
        for name in os.listdir(args.data_dir):
            if name.endswith(".csv"):
                df = pd.read_csv(os.path.join(args.data_dir, name))
                ids, _ = fnv1a_tokenize(df["text"].astype(str).tolist(),
                                        args.seq_len, args.vocab_size)
                return {"input_ids": ids,
                        "y": df["label"].to_numpy().astype(np.int32)}
        raise FileNotFoundError(f"no csv in {args.data_dir}")
    print("No --data_dir: synthetic tweets (smoke mode).")
    rng = np.random.RandomState(0)
    n = args.synthetic_n
    ids = rng.randint(2, args.vocab_size - 1,
                      size=(n, args.seq_len)).astype(np.int32)
    y = rng.randint(0, args.num_classes, size=n).astype(np.int32)
    ids[:, 1] = 3 + y
    return {"input_ids": ids, "y": y}


def main(argv=None):
    args = base_parser().parse_args(argv)
    reject_stack_flags(args, "tweet_eval")
    data = load_data(args)
    model = bertweet_wrapper(
        input_dim=args.text_dim, output_dim=args.num_classes,
        vocab_size=args.vocab_size, num_layers=args.num_encoders,
        num_heads=args.num_heads,
        dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = text_classifier_trainer({
        "model": model,
        "train_loader": ArrayLoader(data, args.train_batch_size,
                                    shuffle=True),
        "epochs": args.num_epochs, "num_classes": args.num_classes,
        "lr": args.learning_rate, "decay": args.decay,
        "lrst": args.learning_rate_scheduler_type,
        "optimizer": args.optimizer, "loss": "Cross Entropy",
        "mesh": make_mesh(),
    })
    hist = trainer.train()
    print(f"mean step latency: "
          f"{np.mean(trainer.latencies) * 1e3:.2f} ms")
    return hist


if __name__ == "__main__":
    main()
