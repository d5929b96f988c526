"""TimeSformer + timesformer-family model tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # full timesformer-family forward sweeps

import jax
import jax.numpy as jnp

from meant_tpu.models import (EmbeddingConfig, meant_mean_pooling, meant_mosi,
                              meant_timesformer)
from meant_tpu.nn.timesformer import TimeSformer, token_shift

TINY_EMB = EmbeddingConfig(vocab_size=100, hidden_size=64,
                           max_position_embeddings=40, dropout=0.0)
B, LAG, S = 2, 5, 16


def test_timesformer_tokens_and_logits():
    ts = TimeSformer(dim=64, num_frames=LAG, num_classes=3, image_size=32,
                     patch_size=16, channels=3, depth=2, heads=4, dim_head=16)
    video = jnp.asarray(np.random.RandomState(0).randn(B, LAG, 3, 32, 32),
                        jnp.float32)
    params = ts.init(jax.random.PRNGKey(0), video)
    logits = ts.apply(params, video)
    assert logits.shape == (B, 3)
    tokens = ts.apply(params, video, return_tokens=True)
    n = (32 // 16) ** 2
    assert tokens.shape == (B, 1 + LAG * n, 64)


def test_timesformer_divided_attention_locality():
    """Time attention only mixes across frames at the same patch; space only
    within a frame; composition mixes everything via cls + both stages. At
    depth=1 a token's value must depend on its own frame and same-patch other
    frames, but changes to a DIFFERENT patch in a DIFFERENT frame reach it
    only through the cls broadcast — verify cls dependence exists."""
    ts = TimeSformer(dim=32, num_frames=3, num_classes=2, image_size=16,
                     patch_size=8, channels=1, depth=1, heads=2, dim_head=16,
                     rotary_emb=True)
    rng = np.random.RandomState(1)
    video = rng.randn(1, 3, 1, 16, 16).astype(np.float32)
    params = ts.init(jax.random.PRNGKey(0), jnp.asarray(video))
    t1 = ts.apply(params, jnp.asarray(video), return_tokens=True)
    v2 = video.copy()
    v2[0, 0, 0, :8, :8] += 1.0  # perturb frame 0, patch 0
    t2 = ts.apply(params, jnp.asarray(v2), return_tokens=True)
    # token (frame 2, patch 3) differs only through cls/global paths — but
    # it MUST differ at all (information flows), and frame-0-patch-0 token
    # must differ strongly.
    d_same = np.abs(np.asarray(t1[0, 1] - t2[0, 1])).max()
    d_far = np.abs(np.asarray(t1[0, -1] - t2[0, -1])).max()
    assert d_same > d_far > 0


def test_token_shift_shapes():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1 + 3 * 4, 12),
                    jnp.float32)
    out = token_shift(x, f=3)
    assert out.shape == x.shape
    # cls untouched
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))


def _batch():
    rng = np.random.RandomState(0)
    return {
        "input_ids": jnp.asarray(rng.randint(2, 100, (B, LAG, S)), jnp.int32),
        "pixels": jnp.asarray(rng.randn(B, LAG, 3, 32, 32), jnp.float32),
        "prices": jnp.asarray(rng.randn(B, LAG, 5), jnp.float32),
        "attention_mask": jnp.ones((B, LAG, S), jnp.float32),
    }


def test_meant_timesformer():
    m = meant_timesformer(text_dim=64, image_dim=64, price_dim=5, height=32,
                          width=32, patch_res=16, lag=LAG, num_classes=2,
                          embedding=TINY_EMB, num_heads=8, num_encoders=1,
                          channels=3, seq_len=32)
    kw = _batch()
    params = m.init(jax.random.PRNGKey(0), **kw)
    out = m.apply(params, **kw)
    assert out.shape == (B, 2)


def test_meant_mean_pooling():
    m = meant_mean_pooling(text_dim=64, image_dim=64, price_dim=5, height=32,
                           width=32, patch_res=16, lag=LAG, num_classes=2,
                           embedding=TINY_EMB, num_heads=8, num_encoders=1,
                           channels=3, seq_len=32)
    kw = _batch()
    params = m.init(jax.random.PRNGKey(0), **kw)
    out = m.apply(params, **kw)
    assert out.shape == (B, 2)


def test_meant_mosi():
    rng = np.random.RandomState(0)
    kw = {
        "input_ids": jnp.asarray(rng.randn(B, 50, 64), jnp.float32),
        "pixels": jnp.asarray(rng.randn(B, 50, 20), jnp.float32),
        "audio": jnp.asarray(rng.randn(B, 50, 130), jnp.float32),
        "audio_mask": jnp.ones((B, 50), jnp.float32),
    }
    m = meant_mosi(text_dim=64, image_dim=64, lag=50, num_classes=2,
                   embedding=None, num_heads=8, num_encoders=1)
    params = m.init(jax.random.PRNGKey(0), **kw)
    out = m.apply(params, **kw)
    assert out.shape == (B, 2)


def test_timesformer_flash_matches_xla():
    """flash=True routes long time/space groups through the Pallas kernel
    (interpret mode on CPU) — outputs must match the XLA path. 16x(32x32)
    patch-8 frames => space groups of 16+1, time groups of 16+1; with
    flash_min_seq lowered, both go through the kernel."""
    import functools
    from unittest import mock

    import jax
    import jax.numpy as jnp
    import numpy as np

    from meant_tpu.nn.timesformer import TimeSformer, TSAttention

    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.randn(1, 16, 3, 32, 32).astype(np.float32) * .5)
    kw = dict(dim=64, image_size=32, patch_size=8, num_frames=16,
              num_classes=2, depth=1, heads=4, dim_head=16)
    ref_model = TimeSformer(flash=False, **kw)
    params = ref_model.init(jax.random.PRNGKey(0), video)
    ref = ref_model.apply(params, video, return_tokens=True)

    flash_model = TimeSformer(flash=True, **kw)
    with mock.patch.object(TSAttention, "flash_min_seq", 8):
        out = flash_model.apply(params, video, return_tokens=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
