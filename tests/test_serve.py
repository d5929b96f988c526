"""Predictor: checkpoint restore + fixed-shape batched inference."""

import numpy as np

from meant_tpu.models import EmbeddingConfig, meant_tweet
from meant_tpu.serve import Predictor

import jax

TINY_EMB = EmbeddingConfig(vocab_size=64, hidden_size=32,
                           max_position_embeddings=40, dropout=0.0)


def test_predictor_pads_and_matches_direct():
    import jax.numpy as jnp
    model = meant_tweet(text_dim=32, price_dim=4, lag=5, num_classes=2,
                        embedding=TINY_EMB, num_heads=4, num_encoders=1)
    rng = np.random.RandomState(0)
    tweets = rng.randint(2, 64, size=(11, 5, 12)).astype(np.int32)
    mask = np.ones((11, 5, 12), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(tweets),
                        jnp.asarray(mask))["params"]
    pred = Predictor(model, "meant_tweet", params=params, batch_size=4)
    probs = pred({"tweets": tweets, "attention_masks": mask})
    assert probs.shape == (11, 2)
    direct = np.asarray(model.apply({"params": params},
                                    jnp.asarray(tweets), jnp.asarray(mask)))
    np.testing.assert_allclose(probs, direct, rtol=1e-5, atol=1e-6)
