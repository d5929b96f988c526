"""RoBERTa backbone + HF-wrapper-equivalent baselines."""

import numpy as np

import jax
import jax.numpy as jnp

from meant_tpu.nn.roberta import (RobertaModel, ViltWrapper, bertweet_wrapper,
                                  roberta_mlm_wrapper, vl_BERT_Wrapper)

B, S = 2, 10


def tiny_kwargs():
    return dict(vocab_size=64, num_layers=2, dtype=None)


def test_roberta_model():
    m = RobertaModel(vocab_size=64, hidden_size=32, num_layers=2,
                     num_heads=4, intermediate_size=64, dropout=0.0)
    ids = jnp.ones((B, S), jnp.int32) * 5
    mask = jnp.ones((B, S), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ids, mask)
    hidden, pooled = m.apply(params, ids, mask)
    assert hidden.shape == (B, S, 32)
    assert pooled.shape == (B, 32)
    assert bool(jnp.all(jnp.abs(pooled) <= 1.0))  # tanh pooler


def test_bertweet_wrapper():
    m = bertweet_wrapper(input_dim=32, output_dim=2, vocab_size=64,
                         num_layers=1, num_heads=4)
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 64, (B, S)),
                      jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (B, 2)
    assert bool(jnp.all((out >= 0) & (out <= 1)))


def test_roberta_mlm_wrapper():
    m = roberta_mlm_wrapper(input_dim=32, vocab_size=64, num_layers=1, num_heads=4)
    ids = jnp.ones((B, S), jnp.int32) * 3
    params = m.init(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (B, S)


def test_vl_bert_wrapper():
    m = vl_BERT_Wrapper(input_dim=32, output_dim=2, vocab_size=64,
                        num_layers=1, num_heads=4, visual_embed_dim=48,
                        patch_res=16, channels=4)
    ids = jnp.ones((B, S), jnp.int32) * 3
    imgs = jnp.ones((B, 4, 32, 32), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ids, imgs)
    out = m.apply(params, ids, imgs)
    assert out.shape == (B, 2)


def test_vilt_wrapper():
    m = ViltWrapper(input_dim=32, output_dim=2, vocab_size=64, num_layers=1, num_heads=4,
                    patch_res=32, channels=4)
    ids = jnp.ones((B, S), jnp.int32) * 3
    imgs = jnp.ones((B, 4, 64, 64), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ids, imgs)
    out = m.apply(params, ids, imgs)
    assert out.shape == (B, 2)
