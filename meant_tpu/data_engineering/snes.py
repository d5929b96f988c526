"""djiaNews preparation — rebuild of `src/snes.py:7-59`.

Merges Combined_News_DJIA with the DJIA price table, labels each day by the
next-day movement ratio (>= +0.55% -> 1, <= -0.5% -> 0, else dropped), and
adds 5-day shifted columns (suffix `_{4-i}` — day 4 is the target day).
"""

from __future__ import annotations

import pandas as pd

HIGH_RATIO = 0.0055
LOW_RATIO = -0.005
LAG = 5


def movement_labels(df: pd.DataFrame, close_col: str = "Adj Close",
                    high_ratio: float = HIGH_RATIO,
                    low_ratio: float = LOW_RATIO) -> pd.DataFrame:
    """Adds `djia_label` from the NEXT day's close vs today's
    (`src/snes.py:23-37`)."""
    df = df.copy()
    labels = [None] * len(df)
    closes = df[close_col].to_numpy()
    for i in range(len(df) - 1):
        ratio = (closes[i + 1] - closes[i]) / closes[i]
        if ratio >= high_ratio:
            labels[i] = 1
        elif ratio <= low_ratio:
            labels[i] = 0
    df["djia_label"] = labels
    return df


def add_lag_shifts(df: pd.DataFrame, lag: int = LAG,
                   keep=("Date", "djia_label")) -> pd.DataFrame:
    """5-day shifted columns `col_{4-i}` + aux dates, NaN rows dropped
    (`src/snes.py:41-57`)."""
    cols = [c for c in df.columns if c not in set(keep) | {"label"}]
    shifted = []
    for i in range(lag):
        shifted.append(df[cols].shift(i).add_suffix(f"_{lag - 1 - i}"))
    for i in range(lag):
        shifted.append(df["Date"].shift(i).rename(f"aux_date_{lag - 1 - i}"))
    out = pd.concat([df[list(keep)]] + shifted, axis=1)
    return out.dropna().reset_index(drop=True)


def prepare(news_csv: str, price_csv: str, out_csv: str) -> pd.DataFrame:
    news = pd.read_csv(news_csv)
    price = pd.read_csv(price_csv)
    merged = pd.merge(news, price, on="Date", how="inner")
    merged = movement_labels(merged)
    result = add_lag_shifts(merged)
    result.to_csv(out_csv, index=False)
    return result
