"""Tensor-parallel sharding on a 2-D (data, model) CPU mesh: train step
compiles and runs; sharded params match the rules; outputs match the
replicated run."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from meant_tpu.models import EmbeddingConfig, meant_tweet
from meant_tpu.parallel import (batch_sharding, make_mesh, param_shardings,
                                shard_params)

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)


def build():
    model = meant_tweet(text_dim=32, price_dim=4, lag=5, num_classes=2,
                        embedding=TINY_EMB, num_heads=4, num_encoders=1)
    rng = np.random.RandomState(0)
    tweets = jnp.asarray(rng.randint(2, 64, (8, 5, 12)), jnp.int32)
    mask = jnp.ones((8, 5, 12), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), tweets, mask)["params"]
    return model, params, tweets, mask


def test_rules_applied():
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    model, params, tweets, mask = build()
    shardings = param_shardings(params, mesh)
    enc = shardings["languageEncoders_0"]
    assert enc["attn"]["q"]["dense"]["kernel"].spec == P(None, "model")
    assert enc["attn"]["multi_mad"]["dense"]["kernel"].spec == \
        P("model", None)
    assert shardings["embedding"]["word_embeddings"].spec == P("model", None)
    # norms replicated
    assert enc["norm1"]["scale"].spec == P()


def test_tp_forward_matches_replicated():
    model, params, tweets, mask = build()
    out_ref = model.apply({"params": params}, tweets, mask)

    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    sharded = shard_params(params, mesh)
    db = jax.device_put(tweets, batch_sharding(mesh))
    dm = jax.device_put(mask, batch_sharding(mesh))

    fwd = jax.jit(lambda p, t, m: model.apply({"params": p}, t, m))
    out = fwd(sharded, db, dm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)


def test_tp_grad_step_runs():
    model, params, tweets, mask = build()
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    sharded = shard_params(params, mesh)
    db = jax.device_put(tweets, batch_sharding(mesh))
    dm = jax.device_put(mask, batch_sharding(mesh))
    y = jax.device_put(jnp.zeros((8,), jnp.int32), batch_sharding(mesh))

    def loss(p, t, m, y):
        out = model.apply({"params": p}, t, m)
        logp = jax.nn.log_softmax(out.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))

    g = jax.jit(jax.grad(loss))(sharded, db, dm, y)
    leaf = jax.tree.leaves(g)[0]
    assert np.isfinite(np.asarray(leaf)).all()
