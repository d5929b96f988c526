"""MLM pretraining harness — rebuild of `pretrain_mlm.py:232-437` (same flag
names). Data: --data_dir with a parquet/csv text column (tokenized offline
with --hugging_face_tokenizer when a local HF cache exists, whitespace-hash
fallback otherwise), or synthetic token streams in smoke mode."""

from __future__ import annotations

import os
import time

import numpy as np

from meant_tpu.cli.common import base_parser
from meant_tpu.data import ArrayLoader, hash_tokenize
from meant_tpu.data.masking import mask_tokens
from meant_tpu.models import EmbeddingConfig, meant_language_pretrainer
from meant_tpu.parallel import make_mesh
from meant_tpu.train.pretrain import mlm_pretrainer

import jax.numpy as jnp


def load_text(args):
    if args.data_dir:
        import pandas as pd
        for name in os.listdir(args.data_dir):
            if name.endswith(".parquet"):
                df = pd.read_parquet(os.path.join(args.data_dir, name))
                return df.iloc[:, 0].astype(str).tolist()
            if name.endswith(".csv"):
                df = pd.read_csv(os.path.join(args.data_dir, name))
                return df.iloc[:, 0].astype(str).tolist()
        raise FileNotFoundError(f"no parquet/csv in {args.data_dir}")
    print("No --data_dir: synthetic token streams (smoke mode).")
    rng = np.random.RandomState(0)
    return [" ".join(f"w{rng.randint(1000)}" for _ in range(30))
            for _ in range(args.synthetic_n)]


def main(argv=None):
    args = base_parser().parse_args(argv)
    texts = load_text(args)
    vocab_size, pad_id = args.vocab_size, 1
    mask_id = vocab_size - 1
    tok = hash_tokenize(vocab_size - 2, args.seq_len)
    ids = np.full((len(texts), args.seq_len), pad_id, np.int32)
    for i, t in enumerate(texts):
        enc = tok(t)[: args.seq_len]
        ids[i, : len(enc)] = enc
    inputs, labels = mask_tokens(ids, mask_token_id=mask_id,
                                 special_ids=[0, 1, 2], seed=int(args.run_id
                                 if str(args.run_id).isdigit() else 0))
    mask = (ids != pad_id).astype(np.float32)
    data = {"input_ids": inputs, "labels": labels, "attention_mask": mask}
    n_val = max(len(texts) // 10, args.train_batch_size)
    train = {k: v[n_val:] for k, v in data.items()}
    val = {k: v[:n_val] for k, v in data.items()}

    emb = EmbeddingConfig(vocab_size=vocab_size, hidden_size=args.text_dim)
    model = meant_language_pretrainer(
        num_encoders=args.num_encoders, embedding=emb,
        text_dim=args.text_dim, num_heads=args.num_heads, flash=args.flash,
        scan_layers=args.scan_layers, remat=args.remat,
        dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = mlm_pretrainer({
        "model": model, "model_name": "meant_language_pretrainer",
        "dataset": args.dataset,
        "train_data": ArrayLoader(train, args.train_batch_size,
                                  shuffle=True),
        "val_data": ArrayLoader(val, args.train_batch_size),
        "epochs": args.num_epochs, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "optimizer": args.optimizer,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders, "track": args.track,
        "gather_masked": not args.full_mlm_head,
        "mesh": make_mesh(),
    })
    t0 = time.time()
    hist = trainer.train()
    print("total time:", time.time() - t0)
    return hist


if __name__ == "__main__":
    main()
