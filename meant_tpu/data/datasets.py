"""Dataset assembly: TempStock-small `.npy` loading, deterministic splits,
lag-window CSV datasets (TempStockLarge / Stocknet / djiaNews), synthetic
generators for tests/benchmarks.

Reference behavior preserved:
  * TempStock small (`in_loop_train.py:579-681`): graphs/tweets/attention
    masks/macds/labels loaded from `.npy`, optional global-mean normalize,
    60/20/20 split via two sklearn train_test_split(random_state=42) calls.
  * TempStockLarge CSVs (`src/utils/custom_datasets.py:440-560`): text
    columns text_0..text_{lag-1}, price columns
    {EMA12,EMA26,Signal_Line,MACD_Histogram,MACD}_i per lag day, labels, and
    `.npy` graph tensors; tokenization happens OFFLINE here (fixed shapes for
    TPU) instead of per-item in __getitem__ (the reference's CPU hot spot,
    SURVEY.md §3).
  * Stocknet (`src/utils/custom_datasets.py:398-437`): per-day text columns +
    3 price features.
  * djiaNews (`src/utils/custom_datasets.py:353-396`): Top1..Top25 headlines
    joined per day x 5 shifted day-columns.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Tuple

import numpy as np

TEMPSTOCK_PRICE_COLS = ("EMA12", "EMA26", "Signal_Line", "MACD_Histogram",
                        "MACD")


def _sklearn_shuffle_split(n: int, test_size: float,
                           seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact sklearn `train_test_split(test_size=..., random_state=seed)`
    membership AND order, without importing sklearn: ShuffleSplit draws
    `RandomState(seed).permutation(n)`, takes `ceil(test_size*n)` leading
    entries as test and the rest as train (sklearn
    `model_selection._split._validate_shuffle_split` + `ShuffleSplit.
    _iter_indices`). Pinned against the real sklearn in
    tests/test_data.py::TestSplit for odd/even/prime n."""
    perm = np.random.RandomState(seed).permutation(n)
    n_test = int(math.ceil(test_size * n))
    return perm[n_test:], perm[:n_test]


def train_val_test_split(n: int, seed: int = 42,
                         test_size: float = 0.2,
                         val_size: float = 0.25) -> Tuple[np.ndarray, ...]:
    """The reference's two-stage split (`in_loop_train.py:607-621`):
    `train_test_split(test_size=0.2, random_state=42)` carves off test,
    then `train_test_split(test_size=0.25, random_state=42)` splits the
    remainder into train/val — 60/20/20. Index membership and order are
    IDENTICAL to running sklearn on the same arrays, so real-data F1
    comparisons against the reference's logged rows (slurm-42756024 /
    slurm-42916564) are computed on the same test set."""
    train_val, test = _sklearn_shuffle_split(n, test_size, seed)
    tr, va = _sklearn_shuffle_split(len(train_val), val_size, seed)
    return train_val[tr], train_val[va], test


def load_tempstock_small(dir_path: str, lag_suffix: str = "_5",
                         normalize: bool = False) -> Dict[str, np.ndarray]:
    """Load the SMOTE-resampled TempStock-small arrays
    (`graphs{lag}.npy, tweets{lag}.npy, attention_masks{lag}.npy,
    macds{lag}.npy, y_resampled{lag}.npy`, `in_loop_train.py:589-593`)."""
    def L(name):
        return np.load(os.path.join(dir_path, f"{name}{lag_suffix}.npy"))

    graphs = L("graphs")
    if normalize:
        graphs = graphs - graphs.mean()
    return {"graphs": graphs, "tweets": L("tweets"),
            "attention_masks": L("attention_masks"), "macds": L("macds"),
            "y": L("y_resampled")}


def split_arrays(arrays: Dict[str, np.ndarray], seed: int = 42):
    n = len(next(iter(arrays.values())))
    tr, va, te = train_val_test_split(n, seed)
    pick = lambda sel: {k: v[sel] for k, v in arrays.items()}
    return pick(tr), pick(va), pick(te)


def tempstock_large_from_frame(df, graphs: np.ndarray, tokenize, lag: int = 5,
                               max_len: int = 512, pad_id: int = 1):
    """Build fixed-shape arrays from a TempStockLarge-layout DataFrame:
    text_0..text_{lag-1} columns + per-day price features + `label`.
    `tokenize(text) -> list[int]` is supplied by the harness (HF tokenizer
    when available, whitespace-hash fallback otherwise)."""
    n = len(df)
    input_ids = np.full((n, lag, max_len), pad_id, np.int32)
    attention_mask = np.zeros((n, lag, max_len), np.float32)
    prices = np.zeros((n, lag, len(TEMPSTOCK_PRICE_COLS)), np.float32)
    for i, (_, row) in enumerate(df.iterrows()):
        for day in range(lag):
            ids = tokenize(str(row[f"text_{day}"]))[:max_len]
            input_ids[i, day, :len(ids)] = ids
            attention_mask[i, day, :len(ids)] = 1.0
            for j, col in enumerate(TEMPSTOCK_PRICE_COLS):
                prices[i, day, j] = row[f"{col}_{day}"]
    labels = df["label"].to_numpy().astype(np.int32)
    return {"input_ids": input_ids, "attention_mask": attention_mask,
            "prices": prices, "pixels": graphs.astype(np.float32),
            "y": labels}


def stocknet_from_frame(df, tokenize, lag: int = 5, max_len: int = 128,
                        pad_id: int = 1, price_cols=("high", "low", "close")):
    """Stocknet layout (`src/utils/custom_datasets.py:398-437`)."""
    n = len(df)
    input_ids = np.full((n, lag, max_len), pad_id, np.int32)
    attention_mask = np.zeros((n, lag, max_len), np.float32)
    prices = np.zeros((n, lag, len(price_cols)), np.float32)
    for i, (_, row) in enumerate(df.iterrows()):
        for day in range(lag):
            ids = tokenize(str(row[f"text_{day}"]))[:max_len]
            input_ids[i, day, :len(ids)] = ids
            attention_mask[i, day, :len(ids)] = 1.0
            for j, col in enumerate(price_cols):
                key = f"{col}_{day}"
                if key in row:
                    prices[i, day, j] = row[key]
    labels = df["label"].to_numpy().astype(np.int32)
    return {"tweets": input_ids, "attention_masks": attention_mask,
            "prices": prices, "y": labels}


def djia_from_frame(df, tokenize, lag: int = 5, max_len: int = 512,
                    pad_id: int = 1):
    """djiaNews layout (`src/utils/custom_datasets.py:353-396`): 25 headline
    columns per shifted day, joined with spaces."""
    n = len(df)
    input_ids = np.full((n, lag, max_len), pad_id, np.int32)
    attention_mask = np.zeros((n, lag, max_len), np.float32)
    for i, (_, row) in enumerate(df.iterrows()):
        for day in range(lag):
            tops = [str(row.get(f"Top{k}_{day}", "")) for k in range(1, 26)]
            ids = tokenize(" ".join(tops))[:max_len]
            input_ids[i, day, :len(ids)] = ids
            attention_mask[i, day, :len(ids)] = 1.0
    labels = df["label"].to_numpy().astype(np.int32)
    return {"tweets": input_ids, "attention_masks": attention_mask,
            "y": labels}


def read_csv_chunk(csv_file: str, start_row: int, end_row: int):
    """`CSVChunkDataset` analogue (`src/utils/custom_datasets.py:563-571`):
    read a window of a one-text-column CSV without loading the whole file.
    Faithful to the reference incl. its `nrows = end_row - start_row - 1`
    off-by-one (the last requested row is never read) and the fixed
    `names=['text']` / newline terminator."""
    import pandas as pd
    return pd.read_csv(csv_file, skiprows=start_row,
                       nrows=end_row - start_row - 1, names=["text"],
                       lineterminator="\n")


def clean_bad_vqa(records) -> Tuple[list, list]:
    """The `clean_bad` flow of `vqa.py:372-400`: a VQA row is bad when its
    soft-label ids or weights are empty. Accepts HF-style records
    (`{'label': {'ids': [...], 'weights': [...]}}`) or our
    `extract_records` layout (`{'answers': {ans: count}}`). Returns
    (bad_indices, good_indices) like the reference."""
    bad_indices, good_indices = [], []
    for index, data in enumerate(records):
        label = data.get("label") if isinstance(data, dict) else None
        if label is not None:
            empty = (len(label.get("ids", ())) == 0
                     or len(label.get("weights", ())) == 0)
        else:
            empty = len(data.get("answers", {})) == 0
        (bad_indices if empty else good_indices).append(index)
    return bad_indices, good_indices


def filter_arrays(data, good_indices):
    """`FilteredDataset` analogue (`utils/custom_datasets.py:223-233`):
    keep only `good_indices`, eagerly materialized like the reference's
    `data[good_indices]`. Works on our dict-of-arrays layout or any
    indexable sequence."""
    if isinstance(data, dict):
        sel = np.asarray(good_indices, dtype=np.int64)
        return {k: v[sel] for k, v in data.items()}
    return [data[i] for i in good_indices]


def hash_tokenize(vocab_size: int = 64000, max_len: int = 128):
    """Deterministic whitespace-hash tokenizer (FNV-1a via the native C++
    kernel, numpy fallback) — the no-network stand-in for smoke runs; real
    runs pass an HF tokenizer's encode."""
    from meant_tpu import native

    def tok(text: str):
        ids, mask = native.fnv1a_tokenize([text], max_len, vocab_size)
        n = int(mask[0].sum())
        return ids[0, :n].tolist()

    return tok


def synthetic_tempstock(n: int = 64, lag: int = 5, seq: int = 128,
                        channels: int = 4, size: int = 224,
                        vocab: int = 64000, seed: int = 0,
                        learnable: bool = True) -> Dict[str, np.ndarray]:
    """TempStock-shaped synthetic data (tests / bench)."""
    rng = np.random.RandomState(seed)
    tweets = rng.randint(4, vocab, size=(n, lag, seq)).astype(np.int32)
    graphs = rng.randn(n, lag, channels, size, size).astype(np.float32)
    macds = rng.randn(n, lag, 4).astype(np.float32)
    y = rng.randint(0, 2, size=(n,)).astype(np.int32)
    if learnable:
        tweets[y == 1, -1, 0] = 3
        tweets[y == 0, -1, 0] = 5
    masks = np.ones((n, lag, seq), np.float32)
    return {"graphs": graphs, "tweets": tweets, "attention_masks": masks,
            "macds": macds, "y": y}
