"""Shape tests for the src-era model generation."""

import numpy as np

import jax
import jax.numpy as jnp

from meant_tpu.models import (EmbeddingConfig, LSTMEncoder, meantTweetPrice,
                              meant_price, meant_src, mlpEncoder)

TINY_EMB = EmbeddingConfig(vocab_size=100, hidden_size=64,
                           max_position_embeddings=40, dropout=0.0)
B, LAG, S = 2, 5, 16


def batch():
    rng = np.random.RandomState(0)
    return {
        "input_ids": jnp.asarray(rng.randint(2, 100, (B, LAG, S)), jnp.int32),
        "pixels": jnp.asarray(rng.randn(B, LAG, 3, 32, 32), jnp.float32),
        "prices": jnp.asarray(rng.randn(B, LAG, 5), jnp.float32),
        "attention_mask": jnp.ones((B, LAG, S), jnp.float32),
    }


def test_meant_src():
    m = meant_src(text_dim=64, image_dim=64, price_dim=5, height=32, width=32,
                  patch_res=16, lag=LAG, num_classes=2, embedding=TINY_EMB,
                  num_heads=8, num_encoders=1, channels=3, seq_len=32)
    kw = batch()
    params = m.init(jax.random.PRNGKey(0), **kw)
    out = m.apply(params, **kw)
    assert out.shape == (B, 2)


def test_meant_src_projection_bug_documented():
    """Bug-faithful mode: LayerNorm(1) collapses the projection to a constant
    (gelu(bias)=0 at init) => perturbing TEXT must not change the output.
    fixed_proj=True restores information flow."""
    kw = batch()
    kw2 = dict(kw)
    rng = np.random.RandomState(1)
    kw2["input_ids"] = jnp.asarray(rng.randint(2, 100, (B, LAG, S)),
                                   jnp.int32)
    for fixed, should_differ in [(False, False), (True, True)]:
        m = meant_src(text_dim=64, image_dim=64, price_dim=5, height=32,
                      width=32, patch_res=16, lag=LAG, num_classes=2,
                      embedding=TINY_EMB, num_heads=8, num_encoders=1,
                      channels=3, seq_len=32, fixed_proj=fixed)
        params = m.init(jax.random.PRNGKey(0), **kw)
        o1 = np.asarray(m.apply(params, **kw))
        o2 = np.asarray(m.apply(params, **kw2))
        differs = not np.allclose(o1, o2)
        assert differs == should_differ, (fixed, differs)


def test_meant_tweet_price():
    m = meantTweetPrice(text_dim=64, price_dim=5, lag=LAG, num_classes=2,
                        embedding=TINY_EMB, num_heads=8)
    kw = batch()
    params = m.init(jax.random.PRNGKey(0), kw["input_ids"], kw["prices"],
                    kw["attention_mask"])
    out = m.apply(params, kw["input_ids"], kw["prices"],
                  kw["attention_mask"])
    assert out.shape == (B, 2)


def test_meant_price():
    m = meant_price(price_dim=5, lag=LAG, num_classes=2, num_heads=1)
    kw = batch()
    params = m.init(jax.random.PRNGKey(0), prices=kw["prices"])
    out = m.apply(params, prices=kw["prices"])
    assert out.shape == (B, 2)


def test_mlp_encoder():
    m = mlpEncoder(input_dim=5, output_dim=2, hidden_dim=16)
    kw = batch()
    params = m.init(jax.random.PRNGKey(0), prices=kw["prices"])
    out = m.apply(params, prices=kw["prices"])
    assert out.shape == (B, LAG, 2)


def test_lstm_encoder():
    m = LSTMEncoder(input_dim=5, output_dim=2, hidden_dim=16)
    kw = batch()
    params = m.init(jax.random.PRNGKey(0), prices=kw["prices"])
    out = m.apply(params, prices=kw["prices"])
    assert out.shape == (B, LAG, 2)
