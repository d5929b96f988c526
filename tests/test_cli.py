"""CLI harness smoke tests (synthetic data, tiny models, CPU mesh)."""

import pytest

from meant_tpu.cli import in_loop_train, pretrain_mim, pretrain_mlm, vqa
from meant_tpu.cli.common import base_parser, build_model, str2bool


def test_str2bool():
    assert str2bool("yes") and str2bool("True") and str2bool("1")
    assert not str2bool("no") and not str2bool("f")
    with pytest.raises(Exception):
        str2bool("maybe")


def test_flag_names_match_reference():
    p = base_parser()
    args = p.parse_args([
        "-rid", "1", "-mn", "meant_tweet", "-ne", "2", "-l", "1e-4",
        "-lrst", "cosine", "-nec", "1", "-lag", "5", "-ds", "Stocknet",
        "-es", "true", "-tb", "8", "-norm", "false", "-t0", "3",
    ])
    assert args.run_id == "1" and args.model_name == "meant_tweet"
    assert args.learning_rate == 1e-4 and args.num_encoders == 1
    assert args.early_stopping is True and args.normalize is False


def test_build_model_registry():
    p = base_parser()
    for name in ["meant", "meant_vision", "meant_tweet",
                 "meant_tweet_no_lag", "meantPrice", "meant_price",
                 "meant_tweet_price", "mlp", "lstm"]:
        args = p.parse_args(["-rid", "0", "-mn", name, "-nec", "1",
                             "--image_size", "32", "--text_dim", "32",
                             "--image_dim", "32", "--vocab_size", "128",
                             "--num_heads", "4"])
        m = build_model(args)
        assert m is not None


def test_in_loop_train_smoke(tmp_path):
    results = in_loop_train.main([
        "-rid", "11", "-mn", "meant_tweet", "-ne", "1", "-nec", "1",
        "-tb", "8", "-fp", str(tmp_path), "--synthetic_n", "32",
        "--seq_len", "12", "--image_size", "32", "--bf16", "false",
        "-lrst", "constant", "--text_dim", "32", "--image_dim", "32", "--vocab_size", "128", "--num_heads", "4"])
    assert "history" in results and len(results["history"]) == 1


def test_pretrain_mlm_smoke(tmp_path):
    hist = pretrain_mlm.main([
        "-rid", "12", "-ne", "1", "-nec", "1", "-tb", "8",
        "-fp", str(tmp_path), "--synthetic_n", "32", "--seq_len", "12",
        "--bf16", "false", "-lrst", "constant", "--text_dim", "32", "--image_dim", "32", "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1


def test_pretrain_mim_smoke(tmp_path):
    hist = pretrain_mim.main([
        "-rid", "13", "-ne", "1", "-nec", "1", "-tb", "8",
        "-fp", str(tmp_path), "--synthetic_n", "24", "--image_size", "32",
        "--bf16", "false", "-lrst", "constant", "--text_dim", "32", "--image_dim", "32", "--vocab_size", "128", "--num_heads", "4"])
    assert len(hist) == 1


def test_vqa_smoke(tmp_path):
    results = vqa.main([
        "-rid", "14", "-mn", "meant_vqa", "-ne", "1", "-nec", "1",
        "-tb", "8", "-nc", "4", "-fp", str(tmp_path), "--synthetic_n", "40",
        "--image_size", "32", "--bf16", "false", "-lrst", "constant",
        "--text_dim", "32", "--image_dim", "32", "--vocab_size", "128", "--num_heads", "4"])
    assert "history" in results


def test_in_loop_train_bucketed(tmp_path):
    """--buckets trains with length-bucketed batches (one compile per
    bucket shape)."""
    results = in_loop_train.main([
        "-rid", "19", "-mn", "meant_tweet", "-ne", "1", "-nec", "1",
        "-tb", "8", "-fp", str(tmp_path), "--synthetic_n", "48",
        "--seq_len", "24", "--image_size", "32", "--bf16", "false",
        "-lrst", "constant", "--text_dim", "32", "--image_dim", "32",
        "--vocab_size", "128", "--num_heads", "4",
        "--buckets", "8,16,24"])
    assert "history" in results and len(results["history"]) == 1
