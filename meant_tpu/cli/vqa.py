"""VQA transfer harness — rebuild of `vqa.py:295-576` (same flags).

Data: --data_dir with prepared VQA records (a .npz of input_ids, images,
soft_targets — produced offline from VQA-v2 annotations via
meant_tpu.data.vqa utilities, mirroring `prepare_vqa.py` + `vqa_manual.py`);
synthetic soft-target data in smoke mode."""

from __future__ import annotations

import os
import time

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser
from meant_tpu.data import ArrayLoader
from meant_tpu.models import EmbeddingConfig, meant_vqa
from meant_tpu.parallel import make_mesh
from meant_tpu.train.vqa import vqa_trainer


def load_vqa(args):
    if args.data_dir:
        z = np.load(os.path.join(args.data_dir, "vqa_prepared.npz"))
        return {"language_input_ids": z["input_ids"],
                "pixel_values": z["images"],
                "attention_mask": z["attention_mask"],
                "pixel_mask": z["pixel_mask"],
                "labels": z["soft_targets"]}
    print("No --data_dir: synthetic VQA records (smoke mode).")
    rng = np.random.RandomState(0)
    n, s, ncls = args.synthetic_n, 24, args.num_classes
    labels = np.zeros((n, ncls), np.float32)
    hard = rng.randint(0, ncls, size=n)
    labels[np.arange(n), hard] = 1.0
    size = args.image_size
    return {
        "language_input_ids": rng.randint(
            2, args.vocab_size - 1, (n, s)).astype(np.int32),
        "pixel_values": rng.randn(n, 4, size, size).astype(np.float32),
        "attention_mask": np.ones((n, s), np.float32),
        "pixel_mask": np.ones((n, size, size), np.float32),
        "labels": labels,
    }


def main(argv=None):
    args = base_parser().parse_args(argv)
    data = load_vqa(args)
    n = len(data["labels"])
    n_val = max(n // 10, args.train_batch_size)
    train = {k: v[2 * n_val:] for k, v in data.items()}
    val = {k: v[:n_val] for k, v in data.items()}
    test = {k: v[n_val:2 * n_val] for k, v in data.items()}

    size = args.image_size
    emb = EmbeddingConfig(vocab_size=args.vocab_size,
                          hidden_size=args.text_dim)
    model = meant_vqa(args.text_dim, args.image_dim, 4, size, size, 16, 1,
                      args.num_classes, embedding=emb, flash=args.flash,
                      num_heads=args.num_heads,
                      num_encoders=args.num_encoders,
                      scan_layers=args.scan_layers, remat=args.remat,
                      dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = vqa_trainer({
        "model": model, "model_name": args.model_name, "dataset": "vqa",
        "train_loader": ArrayLoader(train, args.train_batch_size,
                                    shuffle=True),
        "val_loader": ArrayLoader(val, args.train_batch_size),
        "test_loader": ArrayLoader(test, args.train_batch_size),
        "epochs": args.num_epochs, "num_classes": args.num_classes,
        "optimizer": args.optimizer, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "early_stopping": args.early_stopping,
        "test_model": args.test_model, "file_path": args.file_path,
        "run_id": args.run_id, "num_encoders": args.num_encoders,
        "mesh": make_mesh(),
    })
    t0 = time.time()
    results = trainer.train()
    print("total time:", time.time() - t0)
    return results


if __name__ == "__main__":
    main()
