"""Edge-case coverage: loader remainders, SMOTE degenerate classes, metrics
empty classes, schedule host factors, config loader."""

import numpy as np
import pytest

from meant_tpu.cli.common import embedding_from_config, load_config
from meant_tpu.data import ArrayLoader, smote
from meant_tpu.train.optim import epoch_schedule
from meant_tpu.utils.metrics import binary_auroc, metrics_from_confusion


def test_loader_exact_multiple_no_padding():
    ld = ArrayLoader({"x": np.arange(32)}, 8, drop_remainder=False)
    batches = list(ld)
    assert len(batches) == 4
    assert all(b["_weight"].sum() == 8 for b in batches)


def test_loader_single_short_batch():
    ld = ArrayLoader({"x": np.arange(3)}, 8, drop_remainder=False)
    batches = list(ld)
    assert len(batches) == 1
    assert batches[0]["_weight"].sum() == 3
    assert batches[0]["x"].shape == (8,)


def test_loader_shuffle_deterministic_per_seed():
    a = list(ArrayLoader({"x": np.arange(16)}, 4, shuffle=True, seed=7))
    b = list(ArrayLoader({"x": np.arange(16)}, 4, shuffle=True, seed=7))
    np.testing.assert_array_equal(a[0]["x"], b[0]["x"])


def test_smote_single_class_noop():
    X = np.random.RandomState(0).randn(10, 4)
    y = np.zeros(10, np.int64)
    X2, y2 = smote(X, y)
    assert len(y2) == 10


def test_smote_tiny_minority_noop():
    X = np.random.RandomState(0).randn(10, 4)
    y = np.array([0] * 9 + [1])
    X2, y2 = smote(X, y)  # 1 minority sample: cannot interpolate
    assert len(y2) == 10


def test_metrics_empty_class():
    # class 2 never appears: macro metrics must not NaN
    cm = np.array([[5, 0, 0], [0, 5, 0], [0, 0, 0]])
    m = metrics_from_confusion(cm)
    assert np.isfinite(m["f1_macro"])
    assert m["accuracy"] == 1.0


def test_auroc_degenerate():
    assert binary_auroc(np.array([0.5, 0.5]), np.array([1, 1])) == 0.0
    assert binary_auroc(np.array([]), np.array([])) == 0.0


def test_epoch_schedule_host_factor():
    s = epoch_schedule("cosine", 1.0, tmax=10)
    assert abs(s.host_factor(0) - 1.0) < 1e-9
    assert abs(s.host_factor(10) - 0.0) < 1e-9
    sw = epoch_schedule("cosine_warm", 1.0, t0=7)
    assert abs(sw.host_factor(7) - 1.0) < 1e-9  # restart


def test_config_loader():
    cfg = load_config("bertweet")
    assert cfg["vocab_size"] == 64001
    emb = embedding_from_config("bertweet")
    assert emb.max_position_embeddings == 130
    assert emb.padding_idx == 1
