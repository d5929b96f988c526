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

    def __init__(self, loader, device_put, depth: int = 2,
                 workers: int = 1):
        """workers > 1 runs `device_put` (host collate + transfer staging)
        on a thread pool — batch ORDER is preserved (futures are consumed
        in submission order), only the host-side work overlaps. Use when
        batch assembly is IO-bound (e.g. chart reads from a cold mmap);
        CPU-bound numpy collate mostly holds the GIL, where 1 worker is
        already optimal."""
        self.loader = loader
        self.device_put = device_put
        self.depth = depth
        self.workers = max(int(workers), 1)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()
        ERR = object()
        # staging failures (corrupt read, OOM during collate/transfer) must
        # reach the consumer as the exception they are — a bare END here
        # would silently truncate the epoch and train/score on partial data

        if self.workers == 1:
            def worker():
                try:
                    for batch in self.loader:
                        q.put(self.device_put(batch))
                except BaseException as e:
                    q.put((ERR, e))
                else:
                    q.put(END)
        else:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            def worker():
                try:
                    with ThreadPoolExecutor(self.workers) as pool:
                        # sliding window of in-order futures: parallel
                        # assembly, ordered delivery, bounded look-ahead
                        it = iter(self.loader)
                        pending = deque()
                        live = True
                        while live or pending:
                            while live and len(pending) < (self.workers
                                                           + self.depth):
                                try:
                                    pending.append(pool.submit(
                                        self.device_put, next(it)))
                                except StopIteration:
                                    live = False
                            if pending:
                                q.put(pending.popleft().result())
                except BaseException as e:
                    q.put((ERR, e))
                else:
                    q.put(END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is END:
                break
            if type(item) is tuple and len(item) == 2 and item[0] is ERR:
                t.join()
                raise item[1]
            yield item
        t.join()


class BucketedLoader:
    """Length-bucketed batching: the reference pads DYNAMICALLY to the
    longest sequence in each torch batch (`src/utils/custom_datasets.py:
    238-257`), which static-shape jit cannot do. The TPU equivalent is a
    small set of static bucket lengths: each example lands in the smallest
    bucket that holds its content length, each batch is drawn from ONE
    bucket, and every seq-axis array is sliced to the bucket length — one
    compile per bucket, near-dynamic padding efficiency.

    `length_key` names the (b, lag, s) {0,1} mask whose per-example content
    length (max over lag days) assigns buckets; `seq_keys` are the arrays
    whose last axis gets sliced.

    `bucket_batches` optionally maps bucket length -> batch size, so short
    buckets can run LARGER batches (a constant token budget): a fixed batch
    tuned for the longest bucket underutilizes the chip at short lengths,
    while s=512 itself must stay small (HBM pressure — see the perf ledger's
    batch sweeps). Buckets without an entry use `batch_size`. One compile
    per (bucket, batch) shape, as before. On a DP mesh every bucket's batch
    must stay divisible by the data-axis size (shard_batch splits the
    leading dim) — pass that size as `batch_divisor` so an indivisible
    entry fails HERE instead of as an opaque sharding error inside the
    jitted train step."""

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 seq_keys=("input_ids", "tweets", "attention_masks"),
                 length_key: str = "attention_masks",
                 buckets=(128, 256, 384, 512), shuffle: bool = False,
                 seed: int = 0, bucket_batches: Dict[int, int] = None,
                 batch_divisor: int = 1):
        sizes = {k: len(v) for k, v in arrays.items()}
        assert len(set(sizes.values())) == 1, f"ragged arrays: {sizes}"
        self.arrays = arrays
        self.batch_size = batch_size
        self.bucket_batches = dict(bucket_batches or {})
        self.seq_keys = [k for k in seq_keys if k in arrays]
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        mask = arrays[length_key]
        lengths = mask.reshape(mask.shape[0], -1, mask.shape[-1]) \
            .sum(-1).max(-1)                      # (n,) content lengths
        s_max = mask.shape[-1]
        self.buckets = sorted(min(b, s_max) for b in buckets
                              if b <= s_max) or [s_max]
        if self.buckets[-1] < s_max:
            self.buckets.append(s_max)
        edges = np.asarray(self.buckets)
        self.assignment = edges[np.searchsorted(edges, lengths,
                                                side="left").clip(
                                                    0, len(edges) - 1)]
        self.index = {b: np.flatnonzero(self.assignment == b)
                      for b in self.buckets}
        # a typo'd key (e.g. {129: 64}) would otherwise be silently ignored
        # and that bucket would run at the default batch size, mislabeling
        # any measurement built on it
        stray = set(self.bucket_batches) - set(self.buckets)
        if stray:
            raise ValueError(
                f"bucket_batches keys {sorted(stray)} are not buckets "
                f"(buckets resolved to {self.buckets})")
        bad = {b: self._bucket_bs(b) for b in self.buckets
               if self._bucket_bs(b) % max(int(batch_divisor), 1)}
        if bad:
            raise ValueError(
                f"per-bucket batch sizes {bad} are not divisible by the "
                f"data-axis size {batch_divisor}; shard_batch would fail "
                f"inside the train step")

    def _bucket_bs(self, bucket: int) -> int:
        return int(self.bucket_batches.get(bucket, self.batch_size))

    def __len__(self):
        return sum(len(ix) // self._bucket_bs(b)
                   for b, ix in self.index.items())

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        plan = []
        for b, ix in self.index.items():
            bs = self._bucket_bs(b)
            ix = ix.copy()
            if self.shuffle:
                self.rng.shuffle(ix)
            for i in range(len(ix) // bs):
                plan.append((b, ix[i * bs:(i + 1) * bs]))
        if self.shuffle:
            self.rng.shuffle(plan)
        for bucket, sel in plan:
            batch = {}
            for k, v in self.arrays.items():
                out = v[sel]
                if k in self.seq_keys:
                    out = out[..., :bucket]
                batch[k] = out
            batch["_weight"] = np.ones((len(sel),), np.float32)
            yield batch
