from .loader import ArrayLoader
from .datasets import (clean_bad_vqa, djia_from_frame, filter_arrays,
                       hash_tokenize, load_tempstock_small, read_csv_chunk,
                       split_arrays, stocknet_from_frame, synthetic_tempstock,
                       tempstock_large_from_frame, train_val_test_split)
from .macd import (crossover_labels, ema, lag_windows, macd_signal, rsi,
                   tempstock_price_features)
from .smote import smote, smote_lag_windows

__all__ = [
    "ArrayLoader", "djia_from_frame", "hash_tokenize",
    "load_tempstock_small", "split_arrays", "stocknet_from_frame",
    "synthetic_tempstock", "tempstock_large_from_frame",
    "train_val_test_split", "crossover_labels", "ema", "lag_windows",
    "macd_signal", "rsi", "tempstock_price_features", "smote",
    "smote_lag_windows", "clean_bad_vqa", "filter_arrays", "read_csv_chunk",
]
