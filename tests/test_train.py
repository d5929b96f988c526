"""Trainer smoke tests: synthetic Stocknet-shaped data, 8-device CPU mesh.

The batch is sharded over the 'data' mesh axis; gradients allreduce via the
psum XLA inserts (data-parallel over ICI on real hardware, SURVEY.md §2.7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meant_tpu.data import ArrayLoader
from meant_tpu.models import EmbeddingConfig, meant_tweet
from meant_tpu.parallel import make_mesh
from meant_tpu.train import meant_trainer
from meant_tpu.train import checkpoint as ckpt
from meant_tpu.utils.metrics import binary_auroc, metrics_from_confusion

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)
B, LAG, S = 16, 5, 12


def synthetic_data(n=64, seed=0):
    rng = np.random.RandomState(seed)
    tweets = rng.randint(2, 64, size=(n, LAG, S)).astype(np.int32)
    masks = np.ones((n, LAG, S), np.float32)
    y = (tweets[:, -1, :6].sum(axis=1) % 2).astype(np.int32)
    # make the label learnable: plant a signal token
    tweets[y == 1, -1, 0] = 3
    tweets[y == 0, -1, 0] = 5
    return {"tweets": tweets, "attention_masks": masks, "y": y}


def make_trainer(tmp_path, epochs=3, early_stopping=False):
    data = synthetic_data(64)
    val = synthetic_data(32, seed=1)
    model = meant_tweet(text_dim=32, price_dim=4, lag=LAG, num_classes=2,
                        embedding=TINY_EMB, num_heads=4, num_encoders=1)
    return meant_trainer({
        "model": model, "model_name": "meant_tweet", "dataset": "Stocknet",
        "train_loader": ArrayLoader(data, B, shuffle=True),
        "val_loader": ArrayLoader(val, B, drop_remainder=False),
        "test_loader": ArrayLoader(val, B, drop_remainder=False),
        "epochs": epochs, "num_classes": 2, "lag": LAG,
        "file_path": str(tmp_path), "run_id": "42", "num_encoders": 1,
        "optimizer": "AdamW", "lr": 5e-3, "lrst": "constant",
        "early_stopping": early_stopping, "test_model": True,
        "mesh": make_mesh(),
    })


def test_mesh_is_multi_device():
    assert len(jax.devices()) == 8  # conftest forces the 8-CPU platform


def test_train_loss_decreases(tmp_path):
    trainer = make_trainer(tmp_path, epochs=4)
    results = trainer.train()
    losses = [h["train_loss"] for h in trainer.history]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert "test" in results
    assert results["test"]["accuracy"] > 0.6  # learnable planted signal


def test_checkpoint_roundtrip_and_graft(tmp_path):
    trainer = make_trainer(tmp_path, epochs=1)
    trainer.train()
    import os
    root = os.path.join(str(tmp_path), "models", "meant_tweet")
    names = os.listdir(root)
    assert any(n.startswith("meant_tweet_1_Stocknet_42_") for n in names)
    restored = ckpt.restore(os.path.join(root, names[0]))
    # graft language encoders into a fresh init
    fresh = jax.tree.map(np.zeros_like, dict(trainer.state.params))
    grafted = ckpt.graft(fresh, restored["params"])
    assert np.allclose(
        np.asarray(grafted["languageEncoders_0"]["proj_in"]["dense"]["kernel"]),
        np.asarray(restored["params"]["languageEncoders_0"]["proj_in"]["dense"]["kernel"]))
    # non-grafted keys untouched
    assert np.all(np.asarray(grafted["mlpHead"]["proj"]["dense"]["kernel"]) == 0)


def test_metrics_against_sklearn_free_reference():
    # hand-checked confusion matrix
    cm = np.array([[8, 2], [3, 7]])
    m = metrics_from_confusion(cm)
    assert abs(m["accuracy"] - 0.75) < 1e-9
    prec0, prec1 = 8 / 11, 7 / 9
    rec0, rec1 = 0.8, 0.7
    f1_0 = 2 * prec0 * rec0 / (prec0 + rec0)
    f1_1 = 2 * prec1 * rec1 / (prec1 + rec1)
    assert abs(m["f1_macro"] - (f1_0 + f1_1) / 2) < 1e-9


def test_binary_auroc_exact():
    scores = np.array([0.1, 0.4, 0.35, 0.8])
    labels = np.array([0, 0, 1, 1])
    # sklearn roc_auc_score gives 0.75 for this classic example
    assert abs(binary_auroc(scores, labels) - 0.75) < 1e-9


def test_eval_padding_excluded(tmp_path):
    trainer = make_trainer(tmp_path, epochs=1)
    trainer.train()
    # 32 eval samples / batch 16 => exact; use n=30 to force padding
    val = synthetic_data(30, seed=2)
    loader = ArrayLoader(val, B, drop_remainder=False)
    _, _, metrics = trainer.evaluate(loader, "val")
    total = np.asarray(metrics["confusion"]).sum()
    assert total == 30  # padded rows never counted


def test_resume_restores_optimizer_state(tmp_path):
    trainer = make_trainer(tmp_path, epochs=2)
    trainer.train()
    saved_step = int(trainer.state.step)

    trainer2 = make_trainer(tmp_path, epochs=1)
    batch = next(iter(trainer2.train_loader))
    trainer2.resume(2, batch)  # epochs=2 -> saved as epoch final+1 == 2
    assert int(trainer2.state.step) == saved_step
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(trainer2.state.params)[0]),
        np.asarray(jax.tree.leaves(trainer.state.params)[0]))


def test_mu_dtype_bf16_moments(tmp_path):
    """mu_dtype=bf16 stores the FIRST Adam moment in bf16 (half the HBM
    footprint + optimizer-pass traffic); training tracks the fp32 run."""
    data = synthetic_data(64)
    losses = {}
    for mu in (None, jnp.bfloat16):
        model = meant_tweet(text_dim=32, price_dim=4, lag=LAG,
                            num_classes=2, embedding=TINY_EMB, num_heads=4,
                            num_encoders=1)
        tr = meant_trainer({
            "model": model, "model_name": "meant_tweet",
            "dataset": "Stocknet",
            "train_loader": ArrayLoader(data, B),
            "epochs": 1, "num_classes": 2, "lag": LAG,
            "file_path": str(tmp_path), "run_id": f"mu{mu}",
            "optimizer": "AdamW", "lr": 1e-3, "lrst": "constant",
            "test_model": False, "mesh": make_mesh(), "seed": 0,
            "mu_dtype": mu,
        })
        batch = next(iter(tr.train_loader))
        tr._init_state(batch)
        tr._build_steps()
        db = tr._device_batch(batch)
        run = []
        for _ in range(5):
            tr.state, loss, _ = tr._jit_train(tr.state, db)
            run.append(float(loss))
        losses[mu] = run
        dtypes = {leaf.dtype for leaf in jax.tree.leaves(tr.state.opt_state)
                  if hasattr(leaf, "dtype") and
                  jnp.issubdtype(leaf.dtype, jnp.floating)}
        has_bf16 = any(d == jnp.bfloat16 for d in dtypes)
        has_fp32 = any(d == jnp.float32 for d in dtypes)
        if mu is None:
            assert not has_bf16
        else:
            assert has_bf16 and has_fp32   # mu bf16, nu stays fp32
    # bf16 mu quantization perturbs the trajectory slightly, not wildly
    np.testing.assert_allclose(losses[None], losses[jnp.bfloat16],
                               rtol=0.05, atol=0.01)
