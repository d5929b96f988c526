"""Legacy per-ticker shard-streaming loop — rebuild of `train.py:62-167`
(the oldest harness: streams per-ticker tensors from disk, BCE loss,
Adam + cosine schedule, MCC/AUROC in the metrics, manual test eval).

Shards: one .npz per ticker with tweets / graphs / macds / y arrays
(`--data_dir`); synthetic shards in smoke mode."""

from __future__ import annotations

import os

import numpy as np

from meant_tpu.cli.common import base_parser, build_model
from meant_tpu.data import ArrayLoader, synthetic_tempstock
from meant_tpu.parallel import make_mesh
from meant_tpu.train import meant_trainer


def shard_paths(data_dir):
    return sorted(os.path.join(data_dir, f) for f in os.listdir(data_dir)
                  if f.endswith(".npz"))


class ShardStream:
    """Iterates batches ticker-shard by ticker-shard (`train.py:70-96`)."""

    def __init__(self, paths, batch_size):
        self.paths = paths
        self.batch_size = batch_size
        self._len = None

    def __len__(self):
        if self._len is None:
            self._len = sum(len(ArrayLoader(dict(np.load(p)),
                                            self.batch_size))
                            for p in self.paths)
        return self._len

    def __iter__(self):
        for p in self.paths:
            arrays = dict(np.load(p))
            yield from ArrayLoader(arrays, self.batch_size)


def main(argv=None):
    args = base_parser().parse_args(argv)
    model = build_model(args)
    if args.data_dir:
        stream = ShardStream(shard_paths(args.data_dir),
                             args.train_batch_size)
    else:
        print("No --data_dir: synthetic shards (smoke mode).")
        arrays = synthetic_tempstock(n=args.synthetic_n, lag=args.lag,
                                     seq=args.seq_len, channels=4,
                                     size=args.image_size,
                                     vocab=args.vocab_size - 1)
        stream = ArrayLoader(arrays, args.train_batch_size, shuffle=True)
    trainer = meant_trainer({
        "model": model, "model_name": args.model_name,
        "dataset": args.dataset, "train_loader": stream,
        "epochs": args.num_epochs, "num_classes": args.num_classes,
        "lag": args.lag, "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders,
        "optimizer": "Adam", "lr": args.learning_rate,
        "lrst": "cosine", "tmax": args.tmax,
        "test_model": False, "mesh": make_mesh(),
    })
    return trainer.train()


if __name__ == "__main__":
    main()
