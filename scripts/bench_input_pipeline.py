"""Host input-pipeline throughput: can the data path FEED the chip?

The reference's known bottleneck was its per-batch python collator
(`src/utils/custom_datasets.py:238-277`, SURVEY §3 hot spots). This measures
the meant_tpu replacement producing full src512 training batches on this
host, stage by stage and end to end:

  raw tweets --fnv1a_tokenize--> ragged ids --pad_two_level--> (b,lag,512)
  + chart-image assembly (mmap-style slice + fp32 copy) + prices + labels
  --Prefetcher--> staged batches

Prints samples/s per stage and end-to-end, and the headroom multiple over
the chip's consumption rate (54 samples/s on the v5e bench). Run:
    python scripts/bench_input_pipeline.py [--batches 64] [--batch 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHIP_CONSUMPTION = 54.0  # samples/s, BENCH_r02 src512


def make_raw_corpus(n, lag, words_lo=8, words_hi=120, seed=0):
    """Ragged per-day tweet text, lengths uniform like real TempStock."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(5000)]
    corpus = []
    for _ in range(n):
        days = []
        for _ in range(lag):
            k = rng.randint(words_lo, words_hi)
            days.append(" ".join(rng.choice(vocab, size=k)))
        corpus.append(days)
    return corpus


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--seq_len", type=int, default=512)
    ap.add_argument("--lag", type=int, default=5)
    ap.add_argument("--chart_dtype", default="u8", choices=["f32", "u8"],
                    help="chart store dtype (u8 = device-side normalize)")
    args = ap.parse_args()

    from meant_tpu import native

    b, lag, s = args.batch, args.lag, args.seq_len
    n = b * args.batches
    print(f"native C++ collate available: {native.available()}")
    corpus = make_raw_corpus(n, lag)

    # Image store standing in for the mmap'd .npy chart archive. The
    # reference memmaps charts as float64 (`src/utils/custom_datasets.py:55,
    # 602`) — 6.0 MB/sample of host IO. fp32 halves that; uint8 charts
    # (lossless for rendered plots, normalized ON DEVICE where the cast
    # fuses into the patch embed) cut it 24x to 0.74 MB/sample, which is
    # also 4x less host->device traffic than fp32.
    np_dt = {"f32": np.float32, "u8": np.uint8}[args.chart_dtype]
    store = np.memmap("/tmp/meant_charts.npy", np_dt, mode="w+",
                      shape=(max(n, 256), lag, 3, 224, 224))
    if np_dt == np.uint8:
        store[:256] = np.random.RandomState(1).randint(
            0, 256, size=(256, lag, 3, 224, 224), dtype=np.uint8)
    else:
        store[:256] = np.random.RandomState(1).randn(
            256, lag, 3, 224, 224).astype(np.float32)
    store.flush()

    # ---- stage 1: tokenize (FNV fallback tokenizer, per batch) ----
    t0 = time.perf_counter()
    tokenized = []
    for i in range(0, n, b):
        flat = [d for sample in corpus[i:i + b] for d in sample]
        ids, _ = native.fnv1a_tokenize(flat, s, 64001)
        tokenized.append([ids[j * lag:(j + 1) * lag] for j in range(b)])
    dt_tok = time.perf_counter() - t0
    print(f"tokenize:        {n / dt_tok:10.0f} samples/s")

    # ---- stage 2: ragged two-level pad (the reference's collator) ----
    ragged = [[[int(t) for t in day if t != 1] for day in sample]
              for batch in tokenized for sample in batch]
    t0 = time.perf_counter()
    for i in range(0, n, b):
        ids, mask = native.pad_two_level(ragged[i:i + b], s)
    dt_pad = time.perf_counter() - t0
    print(f"pad_two_level:   {n / dt_pad:10.0f} samples/s")

    # ---- end to end: batch assembly exactly as a real epoch would ----
    rng = np.random.RandomState(2)
    prices = rng.randn(n, lag, 5).astype(np.float32)
    labels = rng.randint(0, 2, size=n).astype(np.int32)

    mb_per_sample = store[0].nbytes / 2 ** 20

    def produce(i):
        ids, mask = native.pad_two_level(ragged[i:i + b], s)
        return {
            "input_ids": ids,
            "attention_masks": mask,
            # mmap read + copy, kept in the STORE dtype — uint8 ships to
            # the device as-is and normalizes on-chip
            "pixels": np.array(store[i % 256:i % 256 + b]),
            "prices": prices[i:i + b],
            "y": labels[i:i + b],
        }

    t0 = time.perf_counter()
    batches = [produce(i) for i in range(0, n, b)]
    dt_e2e = time.perf_counter() - t0
    rate = n / dt_e2e
    print(f"end-to-end:      {rate:10.0f} samples/s "
          f"(incl. {mb_per_sample:.2f} MB/sample chart read)")
    print(f"headroom over chip consumption ({CHIP_CONSUMPTION} samples/s): "
          f"{rate / CHIP_CONSUMPTION:.1f}x")

    # ---- Prefetcher overlap: staging thread keeps ahead of a consumer ----
    from meant_tpu.data.loader import Prefetcher

    class _ListLoader:
        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    t0 = time.perf_counter()
    seen = 0
    for staged in Prefetcher(_ListLoader(), lambda x: x):
        seen += staged["y"].shape[0]
    dt_pf = time.perf_counter() - t0
    print(f"via Prefetcher:  {seen / dt_pf:10.0f} samples/s")

    os.unlink("/tmp/meant_charts.npy")


if __name__ == "__main__":
    main()
