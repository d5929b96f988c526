"""Tweet tokenization — rebuild of `dataprep.py:24-64`.

Per-day tweet lists are [SEP]-joined, then tokenized to fixed 128-token rows
per ticker. The tokenizer is an HF AutoTokenizer when a local cache exists
(`vinai/bertweet-base` in the reference); the deterministic FNV whitespace
tokenizer otherwise (no-egress environments).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from meant_tpu import native


def make_tokenizer(hf_name: Optional[str] = None, max_len: int = 128,
                   vocab: int = 64001):
    if hf_name:
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(hf_name,
                                                local_files_only=True)

            def encode(texts: List[str]):
                enc = tok(texts, padding="max_length", max_length=max_len,
                          truncation=True, return_tensors="np")
                return (enc["input_ids"].astype(np.int32),
                        enc["attention_mask"].astype(np.float32))

            return encode
        except Exception as e:
            print(f"[dataprep] HF tokenizer unavailable ({e}); "
                  "falling back to FNV tokenizer")

    def encode(texts: List[str]):
        return native.fnv1a_tokenize(texts, max_len, vocab)

    return encode


def join_daily_tweets(tweets_by_day: Dict[str, List[str]]) -> Dict[str, str]:
    """[SEP]-join each day's tweets (`dataprep.py:40-48`)."""
    return {d: " [SEP] ".join(t) for d, t in tweets_by_day.items()}


def prepare_ticker(tweets_by_day: Dict[str, List[str]], out_path: str,
                   hf_name: Optional[str] = None, max_len: int = 128):
    """Tokenize one ticker's daily tweets to a (days, max_len) array + mask,
    saved as .npz with sorted dates."""
    joined = join_daily_tweets(tweets_by_day)
    dates = sorted(joined)
    encode = make_tokenizer(hf_name, max_len)
    ids, mask = encode([joined[d] for d in dates])
    np.savez(out_path, input_ids=ids, attention_mask=mask,
             dates=np.asarray(dates))
    return ids, mask, dates
