"""FSDP / ZeRO-3 parameter + optimizer sharding (parallel/fsdp.py).

The reference has no parameter sharding (SURVEY §2.7 — DataParallel only,
latently broken); this is TPU headroom like TP/PP. What must hold:

  * big kernels get ONE dim sharded over 'data', biases/scalars replicate,
  * a megatron-TP sharding already placed on a leaf is left untouched,
  * the trainer with fsdp=True produces the SAME losses as the replicated
    trainer while its state is physically partitioned across the mesh.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-device FSDP integration legs

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from meant_tpu.parallel import (fsdp_shard, fsdp_shardings, fsdp_spec,
                                make_mesh, shard_params)


def test_fsdp_spec_picks_largest_divisible_dim():
    assert fsdp_spec((768, 3072), 8, min_size=0) == P(None, "data")
    assert fsdp_spec((3072, 768), 8, min_size=0) == P("data", None)
    # largest dim not divisible -> falls to the next divisible one
    assert fsdp_spec((1001, 768), 8, min_size=0) == P(None, "data")
    # nothing divisible -> replicate
    assert fsdp_spec((7, 13), 8, min_size=0) == P()
    # small leaves replicate via min_size
    assert fsdp_spec((768,), 8) == P()
    # scalar / axis_size 1
    assert fsdp_spec((), 8) == P()
    assert fsdp_spec((768, 768), 1, min_size=0) == P()


def test_fsdp_shardings_respect_existing_tp():
    """TP-placed kernels keep their 'model' sharding; the rest FSDP-shards
    over 'data' — the two strategies compose on a 2-D mesh."""
    mesh = make_mesh(axes=("data", "model"), shape=(4, 2))
    params = {
        "q": {"kernel": jnp.zeros((256, 256)), "bias": jnp.zeros((256,))},
        "ff_other": {"kernel": jnp.zeros((256, 1024))},
    }
    tp = shard_params(params, mesh)  # shards q/kernel over 'model'
    assert "model" in str(tp["q"]["kernel"].sharding.spec)
    sh = fsdp_shardings(tp, mesh, axis="data")
    assert "model" in str(sh["q"]["kernel"].spec)          # untouched
    assert "data" in str(sh["ff_other"]["kernel"].spec)    # FSDP'd
    assert sh["q"]["bias"].spec == P()                     # small -> replicated


def test_fsdp_shard_physically_partitions():
    mesh = make_mesh()  # 8-device 1-D 'data'
    tree = {"w": jnp.ones((1024, 512)), "b": jnp.ones((512,))}
    placed, sh = fsdp_shard(tree, mesh)
    shards = placed["w"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (128, 512)  # 1/8th resident per device
    assert placed["b"].addressable_shards[0].data.shape == (512,)


def test_trainer_fsdp_matches_replicated():
    """meant_trainer(fsdp=True): per-epoch losses equal the replicated
    run; params + Adam moments live sharded on device."""
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.train import meant_trainer

    rng = np.random.RandomState(0)
    b, lag, s = 16, 2, 16
    data = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }

    def build():
        return meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                     width=32, patch_res=16, lag=lag, num_classes=2,
                     embedding=EmbeddingConfig(vocab_size=100,
                                               hidden_size=64,
                                               max_position_embeddings=40),
                     num_heads=4, num_encoders=1, channels=4)

    losses = {}
    for fsdp in (False, True):
        trainer = meant_trainer({
            "model": build(), "model_name": "meant",
            "dataset": "Tempstock", "train_loader": ArrayLoader(data, b),
            "epochs": 2, "num_classes": 2, "lag": lag,
            "test_model": False, "run_id": f"fsdp{fsdp}",
            "lrst": "constant", "lr": 1e-3, "fsdp": fsdp, "seed": 0,
        })
        batch = next(iter(trainer.train_loader))
        trainer._init_state(batch)
        trainer._build_steps()
        db = trainer._device_batch(batch)
        run = []
        for _ in range(3):
            trainer.state, loss, _ = trainer._jit_train(trainer.state, db)
            run.append(float(loss))
        losses[fsdp] = run
        if fsdp:
            # the embedding table must be physically partitioned, and the
            # Adam moments must follow it (ZeRO: optimizer state sharded)
            flat = jax.tree_util.tree_flatten_with_path(
                trainer.state.params)[0]
            sharded = [(jax.tree_util.keystr(p), l) for p, l in flat
                       if any(sp is not None for sp in l.sharding.spec)]
            assert sharded, "fsdp=True but every param is replicated"
            path, leaf = sharded[0]
            n_sh = len(leaf.addressable_shards)
            assert n_sh == 8, (path, n_sh)
            mu = jax.tree.leaves(trainer.state.opt_state)
            assert any(
                isinstance(m, jax.Array) and m.shape == leaf.shape and
                any(sp is not None for sp in m.sharding.spec) for m in mu), \
                "Adam moments not sharded with their params"

    np.testing.assert_allclose(losses[False], losses[True], rtol=0,
                               atol=2e-6)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """save() on an FSDP-sharded state (orbax gathers the shards) and
    resume() must restore params + optimizer state back onto the FSDP
    shardings and keep training."""
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.train import meant_trainer

    rng = np.random.RandomState(0)
    b, lag, s = 16, 2, 16
    data = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }

    def build_trainer():
        model = meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                      width=32, patch_res=16, lag=lag, num_classes=2,
                      embedding=EmbeddingConfig(vocab_size=100,
                                                hidden_size=64,
                                                max_position_embeddings=40),
                      num_heads=4, num_encoders=1, channels=4)
        return meant_trainer({
            "model": model, "model_name": "meant", "dataset": "Tempstock",
            "train_loader": ArrayLoader(data, b), "epochs": 1,
            "num_classes": 2, "lag": lag, "test_model": False,
            "run_id": "fsdpckpt", "lrst": "constant", "lr": 1e-3,
            "fsdp": True, "seed": 0, "file_path": str(tmp_path),
        })

    tr = build_trainer()
    batch = next(iter(tr.train_loader))
    tr._init_state(batch)
    tr._build_steps()
    db = tr._device_batch(batch)
    tr.state, l0, _ = tr._jit_train(tr.state, db)
    step_saved = int(tr.state.step)
    ref_param = np.asarray(jax.tree.leaves(tr.state.params)[0])
    tr.save(epoch=0)

    tr2 = build_trainer()
    tr2.resume(0, batch)
    tr2._build_steps()
    assert int(tr2.state.step) == step_saved
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(tr2.state.params)[0]), ref_param)
    # restored params landed on the FSDP shardings
    flat = jax.tree.leaves(tr2.state.params)
    assert any(any(sp is not None for sp in p.sharding.spec) for p in flat)
    # and training continues
    tr2.state, l1, _ = tr2._jit_train(tr2.state, tr2._device_batch(batch))
    assert np.isfinite(float(l1))


def test_pretrainer_fsdp_matches_replicated():
    """_BasePretrainer trainers (mlm/mim/ner/vqa) accept fsdp=True with the
    same semantics as meant_trainer: equal losses, sharded state."""
    from meant_tpu.data import ArrayLoader
    from meant_tpu.train.ner import TokenClassifier, ner_trainer

    rng = np.random.RandomState(0)
    b, s = 16, 16
    data = {
        "input_ids": rng.randint(2, 100, size=(b, s)).astype(np.int32),
        "attention_mask": np.ones((b, s), np.float32),
        "labels": rng.randint(0, 3, size=(b, s)).astype(np.int32),
    }
    losses = {}
    for fsdp in (False, True):
        # hidden 128 -> the 128x512 FF kernels clear DEFAULT_MIN_SIZE
        model = TokenClassifier(num_labels=3, vocab_size=100,
                                hidden_size=128, num_layers=1, num_heads=4,
                                dropout=0.0)
        tr = ner_trainer({
            "model": model, "train_data": ArrayLoader(data, b),
            "epochs": 1, "lrst": "constant", "lr": 1e-3, "fsdp": fsdp,
            "run_id": f"pfsdp{fsdp}",
        })
        batch = next(iter(tr.train_data))
        tr._init_state(batch)
        tr._build_steps()
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        run = []
        for _ in range(3):
            tr.state, loss = tr._jit_train(tr.state, db)
            run.append(float(loss))
        losses[fsdp] = run
        if fsdp:
            flat = jax.tree.leaves(tr.state.params)
            assert any(any(sp is not None for sp in p.sharding.spec)
                       for p in flat)
    np.testing.assert_allclose(losses[False], losses[True], rtol=0,
                               atol=2e-6)


def test_fsdp_composes_with_grad_accumulation():
    """optax.MultiSteps wraps the opt state in param-shaped grad
    accumulators; the shape-based FSDP rule shards them too, and the
    accumulated update equals the replicated accumulated run."""
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.train import meant_trainer

    rng = np.random.RandomState(0)
    b, lag, s = 16, 2, 16
    data = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }
    losses = {}
    for fsdp in (False, True):
        model = meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                      width=32, patch_res=16, lag=lag, num_classes=2,
                      embedding=EmbeddingConfig(vocab_size=100,
                                                hidden_size=64,
                                                max_position_embeddings=40),
                      num_heads=4, num_encoders=1, channels=4)
        tr = meant_trainer({
            "model": model, "model_name": "meant", "dataset": "Tempstock",
            "train_loader": ArrayLoader(data, b), "epochs": 1,
            "num_classes": 2, "lag": lag, "test_model": False,
            "run_id": f"fsdpacc{fsdp}", "lrst": "constant", "lr": 1e-3,
            "fsdp": fsdp, "seed": 0, "accumulation_steps": 2,
        })
        batch = next(iter(tr.train_loader))
        tr._init_state(batch)
        tr._build_steps()
        db = tr._device_batch(batch)
        run = []
        for _ in range(4):   # 2 full accumulation cycles
            tr.state, loss, _ = tr._jit_train(tr.state, db)
            run.append(float(loss))
        losses[fsdp] = run
    np.testing.assert_allclose(losses[False], losses[True], rtol=0,
                               atol=2e-6)
