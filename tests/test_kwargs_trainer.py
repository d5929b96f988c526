"""kwargs-era trainer path (src/trainer.py semantics): meant_src trained via
forward(**batch), plus gradient accumulation."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # end-to-end trainer integration legs

from meant_tpu.data import ArrayLoader
from meant_tpu.models import EmbeddingConfig, meant_src
from meant_tpu.train import meant_trainer

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)
B, LAG, S = 8, 5, 12


def data(n=32):
    rng = np.random.RandomState(0)
    return {
        "input_ids": rng.randint(2, 64, size=(n, LAG, S)).astype(np.int32),
        "pixels": rng.randn(n, LAG, 3, 32, 32).astype(np.float32),
        "prices": rng.randn(n, LAG, 5).astype(np.float32),
        "attention_mask": np.ones((n, LAG, S), np.float32),
        "y": rng.randint(0, 2, size=(n,)).astype(np.int32),
    }


def make_trainer(tmp_path, accumulation_steps=1):
    model = meant_src(text_dim=32, image_dim=32, price_dim=5, height=32,
                      width=32, patch_res=16, lag=LAG, num_classes=2,
                      embedding=TINY_EMB, num_heads=4, num_encoders=1,
                      channels=3, seq_len=S)
    return meant_trainer({
        "model": model, "model_name": "meant_src",
        "dataset": "TempStockLarge",
        "train_loader": ArrayLoader(data(), B, shuffle=True),
        "epochs": 2, "num_classes": 2, "lag": LAG,
        "file_path": str(tmp_path), "run_id": "21", "num_encoders": 1,
        "lr": 1e-3, "lrst": "constant", "test_model": False,
        "accumulation_steps": accumulation_steps,
    })


def test_kwargs_forward_trains(tmp_path):
    tr = make_trainer(tmp_path)
    tr.train()
    assert np.isfinite(tr.history[-1]["train_loss"])


def test_gradient_accumulation(tmp_path):
    tr = make_trainer(tmp_path, accumulation_steps=2)
    tr.train()
    assert np.isfinite(tr.history[-1]["train_loss"])


def test_meant_mosi_trains(tmp_path):
    from meant_tpu.models import meant_mosi
    rng = np.random.RandomState(0)
    n = 16
    data = {
        "input_ids": rng.randn(n, 50, 32).astype(np.float32),
        "pixels": rng.randn(n, 50, 20).astype(np.float32),
        "audio": rng.randn(n, 50, 130).astype(np.float32),
        "audio_mask": np.ones((n, 50), np.float32),
        "y": rng.randint(0, 2, size=n).astype(np.int32),
    }
    model = meant_mosi(text_dim=32, image_dim=32, lag=50, num_classes=2,
                       embedding=None, num_heads=4, num_encoders=1)
    tr = meant_trainer({
        "model": model, "model_name": "meant_mosi", "dataset": "mosi",
        "train_loader": ArrayLoader(data, 8), "epochs": 1,
        "num_classes": 2, "file_path": str(tmp_path), "run_id": "71",
        "lrst": "constant", "test_model": False})
    tr.train()
    assert np.isfinite(tr.history[-1]["train_loss"])


def test_meant_timesformer_trains(tmp_path):
    from meant_tpu.models import meant_timesformer
    rng = np.random.RandomState(0)
    n = 16
    data = {
        "input_ids": rng.randint(2, 64, size=(n, LAG, S)).astype(np.int32),
        "pixels": rng.randn(n, LAG, 3, 32, 32).astype(np.float32),
        "prices": rng.randn(n, LAG, 5).astype(np.float32),
        "attention_mask": np.ones((n, LAG, S), np.float32),
        "y": rng.randint(0, 2, size=n).astype(np.int32),
    }
    model = meant_timesformer(text_dim=32, image_dim=32, price_dim=5,
                              height=32, width=32, patch_res=16, lag=LAG,
                              num_classes=2, embedding=TINY_EMB, num_heads=4,
                              num_encoders=1, channels=3, seq_len=S)
    tr = meant_trainer({
        "model": model, "model_name": "meant_timesformer",
        "dataset": "TempStockLarge",
        "train_loader": ArrayLoader(data, 8), "epochs": 1,
        "num_classes": 2, "file_path": str(tmp_path), "run_id": "72",
        "lrst": "constant", "test_model": False})
    tr.train()
    assert np.isfinite(tr.history[-1]["train_loss"])


def test_meant_src_trains_bucketed(tmp_path):
    """The src flagship through the trainer with length-BUCKETED batches:
    multiple bucket shapes per epoch (one jit per shape), finite losses."""
    import numpy as np
    import jax.numpy as jnp
    from meant_tpu.data.loader import BucketedLoader
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.meant_src import meant_src
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    rng = np.random.RandomState(0)
    n, lag, s = 32, 5, 32
    lengths = rng.choice([8, 16, 32], size=n)
    mask = np.zeros((n, lag, s), np.float32)
    for i, l in enumerate(lengths):
        mask[i, :, :l] = 1
    data = {
        "input_ids": rng.randint(2, 100, (n, lag, s)).astype(np.int32),
        "pixels": rng.randn(n, lag, 3, 32, 32).astype(np.float32),
        "prices": rng.randn(n, lag, 5).astype(np.float32),
        "attention_masks": mask,
        "y": rng.randint(0, 2, n).astype(np.int32),
    }
    model = meant_src(text_dim=32, image_dim=32, price_dim=5, height=32,
                      width=32, patch_res=16, lag=lag, num_classes=2,
                      embedding=EmbeddingConfig(vocab_size=100,
                                                hidden_size=32,
                                                max_position_embeddings=40),
                      num_heads=4, num_encoders=1, channels=3, seq_len=32)
    loader = BucketedLoader(data, 8, buckets=(8, 16, 32), shuffle=True)
    assert len({b["input_ids"].shape[-1] for b in loader}) > 1
    trainer = meant_trainer({
        "model": model, "model_name": "meant_src", "dataset": "TSL",
        "train_loader": loader, "epochs": 2, "num_classes": 2, "lag": lag,
        "mesh": make_mesh(), "test_model": False, "run_id": "bk",
        "file_path": str(tmp_path), "lrst": "constant", "lr": 1e-4,
    })
    results = trainer.train()
    assert len(results["history"]) == 2
    assert np.isfinite(results["history"][-1]["train_loss"])
