"""VQA trainer end-to-end on synthetic soft-target data."""

import numpy as np

from meant_tpu.data import ArrayLoader
from meant_tpu.models import EmbeddingConfig, meant_vqa
from meant_tpu.train.vqa import soft_target_ce, vqa_trainer

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)


def test_soft_target_ce_vs_torch():
    import torch
    rng = np.random.RandomState(0)
    out = rng.randn(4, 6).astype(np.float32)
    t = rng.rand(4, 6).astype(np.float32)
    import jax.numpy as jnp
    lj = float(soft_target_ce(jnp.asarray(out), jnp.asarray(t)))
    lt = float(torch.nn.functional.cross_entropy(torch.tensor(out),
                                                 torch.tensor(t)))
    assert abs(lj - lt) < 1e-5


def test_vqa_trainer_runs(tmp_path):
    rng = np.random.RandomState(0)
    n, s, ncls = 32, 10, 4
    ids = rng.randint(2, 64, size=(n, s)).astype(np.int32)
    labels = np.zeros((n, ncls), np.float32)
    hard = rng.randint(0, ncls, size=n)
    labels[np.arange(n), hard] = 1.0
    ids[:, 0] = 3 + hard  # learnable signal
    data = {
        "language_input_ids": ids,
        "pixel_values": rng.randn(n, 4, 32, 32).astype(np.float32),
        "attention_mask": np.ones((n, s), np.float32),
        "pixel_mask": np.ones((n, 32, 32), np.float32),
        "labels": labels,
    }
    model = meant_vqa(text_dim=32, image_dim=32, price_dim=4, height=32,
                      width=32, patch_res=16, lag=1, num_classes=ncls,
                      embedding=TINY_EMB, num_heads=4)
    tr = vqa_trainer({
        "model": model, "model_name": "meant_vqa",
        "train_loader": ArrayLoader(data, 16, shuffle=True),
        "val_loader": ArrayLoader(data, 16),
        "test_loader": ArrayLoader(data, 16),
        "epochs": 3, "num_classes": ncls, "lr": 3e-3, "lrst": "constant",
        "file_path": str(tmp_path), "run_id": "9"})
    results = tr.train()
    losses = [h["train_loss"] for h in tr.history]
    assert losses[-1] < losses[0]
    assert "test" in results
