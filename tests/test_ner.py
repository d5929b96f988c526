"""NER fine-tune: label alignment + end-to-end training."""

import numpy as np

from meant_tpu.data import ArrayLoader
from meant_tpu.train.ner import TokenClassifier, align_labels, ner_trainer


def test_align_labels():
    word_ids = [[None, 0, 0, 1, 2, 2, None]]
    labels = [[5, 3, 7]]
    out = align_labels(word_ids, labels)
    assert list(out[0]) == [-100, 5, -100, 3, 7, -100, -100]


def test_ner_trainer(tmp_path):
    rng = np.random.RandomState(0)
    n, s, nl = 32, 12, 4
    ids = rng.randint(4, 60, size=(n, s)).astype(np.int32)
    labels = (ids % nl).astype(np.int32)  # learnable: tag = id mod nl
    labels[:, 0] = -100
    data = {"input_ids": ids, "labels": labels,
            "attention_mask": np.ones((n, s), np.float32)}
    model = TokenClassifier(num_labels=nl, vocab_size=64, hidden_size=32,
                            num_layers=1, num_heads=4, dropout=0.0)
    tr = ner_trainer({
        "model": model, "model_name": "ner", "train_data":
        ArrayLoader(data, 16, shuffle=True),
        "val_data": ArrayLoader(data, 16),
        "epochs": 4, "lr": 5e-3, "lrst": "constant",
        "file_path": str(tmp_path), "run_id": "41"})
    hist = tr.train()
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    m = tr.token_f1(ArrayLoader(data, 16), nl)
    assert m["accuracy"] > 0.5
