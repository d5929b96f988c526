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


def test_in_loop_genia_smoke(tmp_path):
    from meant_tpu.cli import in_loop_genia
    hist, metrics = in_loop_genia.main([
        "-rid", "31", "-ne", "1", "-nec", "1", "-tb", "8", "-js", "2",
        "-fp", str(tmp_path), "--synthetic_n", "24", "--seq_len", "16",
        "--bf16", "false", "-lrst", "constant", "--text_dim", "32",
        "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1 and "f1_macro" in metrics


def test_tweet7_smoke(tmp_path):
    from meant_tpu.cli import tweet7
    hist, metrics = tweet7.main([
        "-rid", "32", "-ne", "1", "-nec", "1", "-tb", "8",
        "-lrst", "linear_warmup", "-lrwp", "0.1",
        "-fp", str(tmp_path), "--synthetic_n", "24", "--seq_len", "16",
        "--bf16", "false", "--text_dim", "32",
        "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1 and "f1_macro" in metrics


def test_tweet7_crf_not_implemented(tmp_path):
    import pytest
    from meant_tpu.cli import tweet7
    with pytest.raises(NotImplementedError):
        tweet7.main(["-rid", "33", "-fp", str(tmp_path), "-crf", "1"])


def test_hug_pretrain_mlm_smoke(tmp_path):
    from meant_tpu.cli import hug_pretrain_mlm
    hist = hug_pretrain_mlm.main([
        "-rid", "34", "-ne", "1", "-nec", "1", "-b", "8",
        "-fp", str(tmp_path), "--synthetic_n", "16", "--seq_len", "12",
        "--bf16", "false", "-lrst", "constant", "--text_dim", "32",
        "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1


def test_hug_pretrain_mlm_fixed_loss(tmp_path):
    from meant_tpu.cli import hug_pretrain_mlm
    hist = hug_pretrain_mlm.main([
        "-rid", "35", "-ne", "1", "-nec", "1", "-b", "8",
        "--fixed_loss", "true",
        "-fp", str(tmp_path), "--synthetic_n", "16", "--seq_len", "12",
        "--bf16", "false", "-lrst", "constant", "--text_dim", "32",
        "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1


def test_join_examples_semantics():
    from meant_tpu.train.ner import join_examples
    toks = [["a"], ["b", "c"], ["d"], ["e"]]
    tags = [[1], [2, 3], [4], [5]]
    jt, jg = join_examples(toks, tags, 2)
    assert jt == [["a", "b", "c"], ["d", "e"]]
    assert jg == [[1, 2, 3], [4, 5]]
