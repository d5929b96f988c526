"""Eval harness, legacy shard streaming, generic text classifier."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # end-to-end harness smokes

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


def test_tweet7_crf_repaired_smoke(tmp_path):
    """--crf --impl_crf runs the working CRF head (nn/crf.py) end to end:
    CRF NLL trains, viterbi-decoded macro F1 comes back."""
    from meant_tpu.cli import tweet7
    hist, metrics = tweet7.main([
        "-rid", "34", "-ne", "1", "-nec", "1", "-tb", "8",
        "-crf", "1", "--impl_crf", "1",
        "-fp", str(tmp_path), "--synthetic_n", "24", "--seq_len", "16",
        "--bf16", "false", "-lrst", "constant", "--text_dim", "32",
        "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1 and "f1_macro" in metrics


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


def _tiny_cfg(tmp_path, **over):
    import json
    cfg = {"model_type": "bert", "vocab_size": 128, "hidden_size": 32,
           "num_hidden_layers": 1, "num_attention_heads": 4,
           "intermediate_size": 128, "max_position_embeddings": 64,
           "type_vocab_size": 1, "pad_token_id": 0,
           "layer_norm_eps": 1e-12, "hidden_dropout_prob": 0.0}
    cfg.update(over)
    path = tmp_path / "tiny.json"
    path.write_text(json.dumps(cfg))
    return str(path)


def test_hug_train_token_smoke(tmp_path):
    """Generic config-driven hug fine-tune (src/hug/in_loop_train.py
    equivalent): geometry from the JSON config, token-classification task."""
    from meant_tpu.cli import hug_train
    hist, metrics = hug_train.main([
        "-rid", "36", "-ne", "1", "-tb", "8", "-nc", "5",
        "--config_json", _tiny_cfg(tmp_path),
        "-fp", str(tmp_path), "--synthetic_n", "24", "--seq_len", "16",
        "--bf16", "false", "-lrst", "constant"])
    assert len(hist) == 1 and "f1_macro" in metrics


def test_hug_train_classification_smoke(tmp_path):
    from meant_tpu.cli import hug_train
    hist, _ = hug_train.main([
        "-rid", "37", "-ne", "1", "-tb", "8", "-nc", "3",
        "-t", "classification", "--config_json", _tiny_cfg(tmp_path),
        "-fp", str(tmp_path), "--synthetic_n", "24", "--seq_len", "16",
        "--bf16", "false", "-lrst", "constant"])
    assert hist  # one epoch of history from the text classifier


def test_hug_config_surface_complete():
    """All 11 config JSONs of the reference's src/hug/configs/ exist and
    carry the geometry keys the config-driven harness needs."""
    from meant_tpu.cli.common import load_config
    names = ["bertweet", "roberta", "vilt", "vl_bert", "biobert",
             "bert_ner", "bert_ner_large", "vilbert", "vit_mim",
             "roberta_mlm", "roberta_tweet"]
    for name in names:
        cfg = load_config(name)
        for key in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads"):
            assert key in cfg, (name, key)
    # spot-check reference geometry (src/hug/configs/*.json)
    assert load_config("bert_ner_large")["hidden_size"] == 1024
    assert load_config("roberta_tweet")["num_labels"] == 15
    assert load_config("biobert")["vocab_size"] == 28996


def test_run_other_models_domain_and_metrics_quirk(tmp_path, capsys):
    """run_other_models: restricted model domain ('Pass a valid model
    name.', run_other_models.py:395-431) and the recall-is-precision
    metrics copy bug (:85-86, DEFECTS #27)."""
    import pytest

    from meant_tpu.cli.run_other_models import (_reference_metrics_block,
                                                main)

    with pytest.raises(ValueError, match="Pass a valid model name."):
        main(["-rid", "t", "-mn", "meant_src", "--synthetic_n", "8"])

    m = {"accuracy": 0.5, "f1_macro": 0.4, "f1_micro": 0.5,
         "precision_macro": 0.7, "precision_micro": 0.6,
         "recall_macro": 0.3, "recall_micro": 0.2}
    quirky = dict(_reference_metrics_block(m, "test", fixed_metrics=False))
    assert quirky["Macro test recall: "] == m["precision_macro"]
    assert quirky["Micro test recall: "] == m["precision_micro"]
    fixed = dict(_reference_metrics_block(m, "test", fixed_metrics=True))
    assert fixed["Macro test recall: "] == m["recall_macro"]


def test_run_other_models_smoke(tmp_path):
    """End-to-end smoke at tiny geometry through the delegate path (seed 42
    forwarded, run_other_models.py:37)."""
    from meant_tpu.cli.run_other_models import main

    res = main(["-rid", "t", "-mn", "meant_tweet", "-ne", "1",
                "--synthetic_n", "16", "-tb", "8", "--seq_len", "16",
                "--text_dim", "32", "--num_heads", "4", "-nec", "1",
                "--vocab_size", "100", "-fp", str(tmp_path),
                "-testm", "true"])
    assert res["history"]
