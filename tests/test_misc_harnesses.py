"""Eval harness, legacy shard streaming, generic text classifier."""

import numpy as np

from meant_tpu.data import ArrayLoader
from meant_tpu.train.text_classify import bce_loss, text_classifier_trainer


def test_bce_loss_vs_torch():
    import torch
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    out = rng.rand(8, 2).astype(np.float32)
    y = rng.randint(0, 2, 8)
    lj = float(bce_loss(jnp.asarray(out), jnp.asarray(y)))
    onehot = np.eye(2, dtype=np.float32)[y]
    lt = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(out), torch.tensor(onehot)))
    assert abs(lj - lt) < 1e-5


def test_text_classifier_trainer():
    from meant_tpu.models import bertweet_wrapper
    rng = np.random.RandomState(0)
    n, s = 32, 10
    ids = rng.randint(2, 64, size=(n, s)).astype(np.int32)
    y = rng.randint(0, 2, size=n).astype(np.int32)
    ids[:, 1] = 3 + y
    model = bertweet_wrapper(input_dim=32, output_dim=2, vocab_size=64,
                             num_layers=1, num_heads=4)
    tr = text_classifier_trainer({
        "model": model, "train_loader": ArrayLoader(
            {"input_ids": ids, "y": y}, 16, shuffle=True),
        "epochs": 2, "lr": 3e-3})
    hist = tr.train()
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    assert len(tr.latencies) == 4  # latency probes recorded


def test_legacy_shard_stream(tmp_path):
    from meant_tpu.cli.train_legacy import ShardStream
    for i in range(2):
        np.savez(tmp_path / f"TICK{i}.npz",
                 tweets=np.ones((8, 5, 6), np.int32),
                 y=np.zeros(8, np.int32))
    stream = ShardStream(sorted(str(p) for p in tmp_path.glob("*.npz")), 4)
    batches = list(stream)
    assert len(batches) == 4 and len(stream) == 4


def test_eval_harness_smoke(tmp_path):
    from meant_tpu.cli.eval import main
    metrics = main([
        "-rid", "51", "-mn", "meant_tweet", "-nec", "1", "-tb", "8",
        "--synthetic_n", "40", "--seq_len", "12", "--image_size", "32",
        "--bf16", "false", "--text_dim", "32", "--image_dim", "32",
        "--vocab_size", "128", "--num_heads", "4", "-fp", str(tmp_path)])
    assert "f1_macro" in metrics
