"""End-to-end logit parity: meant (JAX) vs the torch mirror at shared
weights. Target: max |Δlogit| <= 1e-3 (BASELINE.json)."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # torch-mirror oracle

import jax
import jax.numpy as jnp
import torch

from meant_tpu.models import EmbeddingConfig, meant
import torch_mirror as tm


def test_meant_logit_parity():
    emb = EmbeddingConfig(vocab_size=500, hidden_size=768,
                          max_position_embeddings=130, dropout=0.0)
    b, lag, s = 2, 5, 32
    c, H, W, p = 4, 64, 64, 16
    model = meant(text_dim=768, image_dim=768, price_dim=4, height=H,
                  width=W, patch_res=p, lag=lag, num_classes=2,
                  embedding=emb, num_heads=8, num_encoders=2)
    rng = np.random.RandomState(0)
    tweets = rng.randint(2, 500, size=(b, lag, s)).astype(np.int32)
    mask = np.ones((b, lag, s), np.float32)
    mask[:, :, 24:] = 0.0
    tweets[:, :, 24:] = 1  # pad id
    images = rng.randn(b, lag, c, H, W).astype(np.float32) * 0.5

    params = model.init(jax.random.PRNGKey(42), jnp.array(tweets),
                        jnp.array(images), jnp.array(mask))
    out_j = np.asarray(model.apply(params, jnp.array(tweets),
                                   jnp.array(images), jnp.array(mask)))

    mirror = tm.Meant(jax.tree.map(np.asarray, params), num_heads=8,
                      num_encoders=2, lag=lag, patch_res=p)
    with torch.no_grad():
        out_t = mirror(torch.tensor(tweets).long(), torch.tensor(images),
                       torch.tensor(mask)).numpy()

    diff = np.abs(out_j - out_t).max()
    assert diff <= 1e-3, f"logit parity violated: max diff {diff}"
    # Typical agreement should be much tighter than the budget.
    assert diff <= 2e-4, f"parity unexpectedly loose: {diff}"
