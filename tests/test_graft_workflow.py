"""The reference's checkpoint-surgery workflow end-to-end: MLM-pretrain a
language stack, save, graft its encoders + embeddings into a fresh
meant_tweet classifier, fine-tune (`in_loop_train.py:496-507` +
`pretrain_mlm.py` chaining)."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # pretrain->graft->finetune integration

import jax
import jax.numpy as jnp

from meant_tpu.data import ArrayLoader
from meant_tpu.data.masking import mask_tokens
from meant_tpu.models import (EmbeddingConfig, meant_language_pretrainer,
                              meant_tweet)
from meant_tpu.train import checkpoint as ckpt
from meant_tpu.train import meant_trainer
from meant_tpu.train.pretrain import mlm_pretrainer

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)


def test_pretrain_then_graft_then_finetune(tmp_path):
    # 1) MLM pretrain a 1-encoder language stack
    rng = np.random.RandomState(0)
    ids = rng.randint(4, 60, size=(32, 12)).astype(np.int32)
    inputs, labels = mask_tokens(ids, mask_token_id=63,
                                 special_ids=[0, 1, 2], seed=1)
    pre_model = meant_language_pretrainer(num_encoders=1, embedding=TINY_EMB,
                                          text_dim=32, num_heads=4)
    pre = mlm_pretrainer({
        "model": pre_model, "model_name": "meant_language_pretrainer",
        "train_data": ArrayLoader(
            {"input_ids": inputs, "labels": labels,
             "attention_mask": np.ones((32, 12), np.float32)}, 16),
        "epochs": 1, "lr": 1e-3, "lrst": "constant",
        "file_path": str(tmp_path), "run_id": "90"})
    pre.train()
    pretrained = dict(pre.state.params)

    # 2) graft languageEncoders + embedding into a fresh classifier
    clf_model = meant_tweet(text_dim=32, price_dim=4, lag=5, num_classes=2,
                            embedding=TINY_EMB, num_heads=4, num_encoders=1)
    tweets = rng.randint(2, 64, size=(32, 5, 12)).astype(np.int32)
    y = rng.randint(0, 2, size=32).astype(np.int32)
    trainer = meant_trainer({
        "model": clf_model, "model_name": "meant_tweet", "dataset": "S",
        "train_loader": ArrayLoader(
            {"tweets": tweets,
             "attention_masks": np.ones((32, 5, 12), np.float32),
             "y": y}, 16),
        "epochs": 1, "num_classes": 2, "file_path": str(tmp_path),
        "run_id": "91", "lr": 1e-4, "lrst": "constant",
        "test_model": False})
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    fresh = dict(trainer.state.params)
    grafted = ckpt.graft(fresh, pretrained,
                         prefixes=("languageEncoders_", "embedding"))
    # encoder + embedding weights must be the pretrained ones
    np.testing.assert_array_equal(
        np.asarray(grafted["languageEncoders_0"]["attn"]["q"]["dense"]
                   ["kernel"]),
        np.asarray(pretrained["languageEncoders_0"]["attn"]["q"]["dense"]
                   ["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(grafted["embedding"]["word_embeddings"]),
        np.asarray(pretrained["embedding"]["word_embeddings"]))
    # classifier-only parts stay fresh
    assert "temporal_encoding_0" in grafted

    # 3) fine-tune from the grafted tree
    trainer.init_params = grafted
    trainer.state = None
    trainer.train()
    assert np.isfinite(trainer.history[-1]["train_loss"])
