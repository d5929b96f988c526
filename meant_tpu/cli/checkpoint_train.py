"""Resumable NER fine-tune harness — rebuild of `checkpoint_train.py`
(one-epoch-per-job token-classification designed for the checkpoint.sh
chaining workflow) and the `src/hug` NER runs (conll2003/GENIA).

Data: --data_dir with a prepared .npz (input_ids, attention_mask, labels with
-100 alignment — produce via meant_tpu.train.ner.align_labels); synthetic
tagged tokens in smoke mode."""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser, reject_stack_flags
from meant_tpu.data import ArrayLoader
from meant_tpu.parallel import make_mesh
from meant_tpu.train import checkpoint as ckpt
from meant_tpu.train.ner import TokenClassifier, ner_trainer


def load_data(args):
    if args.data_dir:
        z = np.load(os.path.join(args.data_dir, "ner_prepared.npz"))
        return {k: z[k] for k in ("input_ids", "attention_mask", "labels")}
    print("No --data_dir: synthetic NER data (smoke mode).")
    rng = np.random.RandomState(0)
    n, s = args.synthetic_n, args.seq_len
    ids = rng.randint(4, args.vocab_size - 1, size=(n, s)).astype(np.int32)
    labels = (ids % args.num_classes).astype(np.int32)
    labels[:, 0] = -100
    return {"input_ids": ids, "labels": labels,
            "attention_mask": np.ones((n, s), np.float32)}


def main(argv=None):
    args = base_parser().parse_args(argv)
    reject_stack_flags(args, "checkpoint_train")
    data = load_data(args)
    n_val = max(len(data["labels"]) // 10, args.train_batch_size)
    train = {k: v[n_val:] for k, v in data.items()}
    val = {k: v[:n_val] for k, v in data.items()}
    model = TokenClassifier(
        num_labels=args.num_classes, vocab_size=args.vocab_size,
        hidden_size=args.text_dim, num_layers=args.num_encoders,
        num_heads=args.num_heads, dropout=args.dropout,
        dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = ner_trainer({
        "model": model, "model_name": "ner", "dataset": args.dataset,
        "train_data": ArrayLoader(train, args.train_batch_size,
                                  shuffle=True),
        "val_data": ArrayLoader(val, args.train_batch_size),
        "epochs": args.num_epochs, "lr": args.learning_rate,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "optimizer": args.optimizer,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders, "mesh": make_mesh(),
    })
    # --epoch resume (checkpoint.sh chaining): restore the previous epoch's
    # checkpoint before continuing.
    if args.epoch > 0:
        name = ckpt.checkpoint_name("ner", args.num_encoders, args.dataset,
                                    args.run_id, args.epoch)
        path = os.path.join(args.file_path, "models", "ner", name)
        restored = ckpt.restore(path)
        batch = next(iter(trainer.train_data))
        trainer._init_state(batch)
        trainer.state = trainer.state.replace(params=restored["params"])
    hist = trainer.train()
    metrics = trainer.token_f1(ArrayLoader(val, args.train_batch_size),
                               args.num_classes)
    print("Macro test f1:", metrics["f1_macro"])
    return hist, metrics


if __name__ == "__main__":
    main()
