"""Fixed-shape array batch loader.

TPU jit wants static shapes: train batches drop the remainder (reference
DataLoaders behave identically with drop_last semantics for throughput);
eval batches are padded to the batch size and carry a `_weight` vector so
padding never contaminates metrics (replaces the reference's per-step
`.detach().cpu()` metric sync, SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


class ArrayLoader:
    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 drop_remainder: bool = True):
        sizes = {k: len(v) for k, v in arrays.items()}
        assert len(set(sizes.values())) == 1, f"ragged arrays: {sizes}"
        self.arrays = arrays
        self.n = next(iter(sizes.values()))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        if self.drop_remainder:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(self.n)
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = self.batch_size
        num_full = self.n // bs
        for i in range(num_full):
            sel = idx[i * bs:(i + 1) * bs]
            batch = {k: v[sel] for k, v in self.arrays.items()}
            batch["_weight"] = np.ones((bs,), np.float32)
            yield batch
        rem = self.n - num_full * bs
        if rem and not self.drop_remainder:
            sel = idx[num_full * bs:]
            pad = bs - rem
            batch = {}
            for k, v in self.arrays.items():
                tail = v[sel]
                batch[k] = np.concatenate(
                    [tail, np.repeat(tail[:1], pad, axis=0)], axis=0)
            w = np.zeros((bs,), np.float32)
            w[:rem] = 1.0
            batch["_weight"] = w
            yield batch


class Prefetcher:
    """Double-buffered host->device pipeline: assembles and transfers the
    next batch (optionally sharding over a mesh) on a background thread while
    the current step computes — the HBM-resident streaming input path
    replacing the reference's synchronous per-batch `.cuda()` copies
    (`in_loop_train.py:217`, SURVEY.md §3.1)."""

    def __init__(self, loader, device_put, depth: int = 2):
        self.loader = loader
        self.device_put = device_put
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()

        def worker():
            try:
                for batch in self.loader:
                    q.put(self.device_put(batch))
            finally:
                q.put(END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is END:
                break
            yield item
        t.join()
