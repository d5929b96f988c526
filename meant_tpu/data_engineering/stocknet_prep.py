"""Stocknet preparation — rebuild of `src/stocknet_data.py:4-44`.

Per-ticker directories of per-day JSON-lines tweets -> one CSV per ticker
with a [SEP]-joined daily text column. Language filtering uses langdetect
when installed (the reference's behavior); otherwise all tweets are kept and
a note is printed (no-network env has no langdetect wheel).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pandas as pd

try:
    from langdetect import detect
    from langdetect.lang_detect_exception import LangDetectException
    _HAS_LANGDETECT = True
except ImportError:
    _HAS_LANGDETECT = False


def _keep(text: str) -> bool:
    if not _HAS_LANGDETECT:
        return True
    try:
        return detect(text) == "en"
    except LangDetectException:
        return False


def daily_text_frame(ticker_dir: str) -> pd.DataFrame:
    """One row per day: {'date', 'text'} with tweets [SEP]-joined
    (`src/stocknet_data.py:14-37`)."""
    data = []
    for filename in sorted(os.listdir(ticker_dir)):
        if not filename.endswith(".json"):
            continue
        date = filename.split(".")[0]
        combined = ""
        with open(os.path.join(ticker_dir, filename), encoding="utf-8") as f:
            for line in f:
                try:
                    entry = json.loads(line.strip())
                except json.JSONDecodeError:
                    continue
                text = str(entry.get("text", "")).replace("\n", " ")
                if text and _keep(text):
                    combined += text + " [SEP] "
        if combined.strip():
            data.append({"date": date, "text": combined.strip()})
    return pd.DataFrame(data)


def prepare(tweets_root: str, out_dir: str,
            tickers: Optional[list] = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    if not _HAS_LANGDETECT:
        print("[stocknet_prep] langdetect unavailable: keeping all tweets")
    tickers = tickers or sorted(os.listdir(tweets_root))
    for ticker in tickers:
        out_csv = os.path.join(out_dir, f"{ticker}_clean.csv")
        if os.path.exists(out_csv):
            print("Clean tweet file already exists")
            continue
        df = daily_text_frame(os.path.join(tweets_root, ticker))
        df.to_csv(out_csv, index=False)
