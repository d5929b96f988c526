"""int8 quantized inference (nn/quant.py + Predictor(quantize="int8")).

The reference has no quantization; this is the TPU serving lever (int8 MXU
at 2x bf16 rate — scripts/probe_int8.py). What must hold:

  * int8_dense matches the fp32 dense to quantization tolerance,
  * the interceptor quantizes wide Dense layers only (classifier heads
    stay fp32) and leaves the param tree untouched,
  * end-to-end MEANT probabilities track the fp32 model closely enough
    that predictions agree.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # int8 + StableHLO export round-trips

import jax
import jax.numpy as jnp
import flax.linen as nn

from meant_tpu.nn.quant import (MIN_FEATURES, int8_dense, int8_inference,
                                quantized_apply)


def test_int8_dense_matches_fp32_to_quant_tol():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 512).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(512).astype(np.float32) * 0.1)
    ref = x @ w + b
    out = int8_dense(x, w, b)
    # symmetric 127-level quant over ~N(0,1) inputs: relative error ~1%
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale


def test_interceptor_rewrites_wide_dense_only():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(128, name="wide")(x)
            return nn.Dense(2, name="head")(h)

    m = M()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)

    ref = m.apply(params, x)
    out = quantized_apply(m, params, x)
    # the head itself is exact given its input, so the only deviation is
    # the quantized wide layer feeding it
    assert not np.allclose(np.asarray(out), np.asarray(ref), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.1)

    # narrow head alone must be EXACT (not intercepted)
    class H(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2, name="head")(x)

    h = H()
    ph = h.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(quantized_apply(h, ph, x)),
                                  np.asarray(h.apply(ph, x)))
    assert MIN_FEATURES > 2


def test_quantized_apply_under_jit():
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(256)(jax.nn.gelu(nn.Dense(256)(x)))

    m = M()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(16, 256).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    f = jax.jit(lambda p, x_: quantized_apply(m, p, x_))
    out = f(params, x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(m.apply(params, x)),
                               atol=0.35, rtol=0.1)


def test_predictor_int8_tracks_fp32_probs():
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.serve import Predictor

    rng = np.random.RandomState(0)
    b, lag, s = 8, 2, 16
    model = meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                  width=32, patch_res=16, lag=lag, num_classes=2,
                  embedding=EmbeddingConfig(vocab_size=100, hidden_size=64,
                                            max_position_embeddings=40,
                                            dropout=0.0),
                  num_heads=4, num_encoders=2, channels=4)
    batch = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
    }
    tweets = jnp.asarray(batch["tweets"])
    params = model.init(jax.random.PRNGKey(0), tweets,
                        jnp.asarray(batch["graphs"]),
                        jnp.asarray(batch["attention_masks"]))["params"]

    p_fp = Predictor(model, "meant", params=params, batch_size=b)
    p_q = Predictor(model, "meant", params=params, batch_size=b,
                    quantize="int8")
    probs_fp = p_fp(batch)
    probs_q = p_q(batch)
    np.testing.assert_allclose(probs_q, probs_fp, atol=0.05)
    assert (np.argmax(probs_q, -1) == np.argmax(probs_fp, -1)).mean() \
        >= 0.9


def test_predictor_rejects_unknown_quantize():
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.serve import Predictor
    model = meant(text_dim=32, image_dim=32, price_dim=4, height=32,
                  width=32, patch_res=16, lag=1, num_classes=2,
                  embedding=EmbeddingConfig(vocab_size=10, hidden_size=32,
                                            max_position_embeddings=20),
                  num_heads=4, num_encoders=1, channels=4)
    with pytest.raises(ValueError):
        Predictor(model, "meant", params={}, quantize="fp4")


def test_quantize_composes_with_tensor_parallel():
    """int8 interceptor + megatron-sharded params: the quantize ops trace
    over sharded kernels (XLA handles the sharded amax reduction); probs
    match the replicated quantized run exactly."""
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.parallel import make_mesh
    from meant_tpu.serve import Predictor

    rng = np.random.RandomState(0)
    b, lag, s = 8, 2, 16
    model = meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                  width=32, patch_res=16, lag=lag, num_classes=2,
                  embedding=EmbeddingConfig(vocab_size=100, hidden_size=64,
                                            max_position_embeddings=40,
                                            dropout=0.0),
                  num_heads=4, num_encoders=2, channels=4)
    batch = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["tweets"]),
                        jnp.asarray(batch["graphs"]),
                        jnp.asarray(batch["attention_masks"]))["params"]

    mesh = make_mesh(axes=("data", "model"), shape=(1, 8))
    p_rep = Predictor(model, "meant", params=params, batch_size=b,
                      quantize="int8")
    p_tp = Predictor(model, "meant", params=params, batch_size=b,
                     mesh=mesh, tensor_parallel=True, quantize="int8")
    np.testing.assert_allclose(p_tp(batch), p_rep(batch), atol=2e-5)


def test_stablehlo_export_roundtrip(tmp_path):
    """export_forward writes a StableHLO artifact that reproduces the live
    forward (fp32 and int8) WITHOUT touching the python model afterwards."""
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.serve import Predictor, export_forward, load_exported

    rng = np.random.RandomState(0)
    b, lag, s = 4, 2, 16
    model = meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                  width=32, patch_res=16, lag=lag, num_classes=2,
                  embedding=EmbeddingConfig(vocab_size=100, hidden_size=64,
                                            max_position_embeddings=40,
                                            dropout=0.0),
                  num_heads=4, num_encoders=1, channels=4)
    batch = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
    }
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["tweets"]),
                        jnp.asarray(batch["graphs"]),
                        jnp.asarray(batch["attention_masks"]))["params"]

    for quant in (None, "int8"):
        path = str(tmp_path / f"meant_{quant}.stablehlo")
        export_forward(model, "meant", params, batch, path, quantize=quant)
        fn = load_exported(path)
        db = {k: jnp.asarray(v) for k, v in batch.items()}
        got = np.asarray(fn(params, db))
        want = np.asarray(Predictor(model, "meant", params=params,
                                    batch_size=b,
                                    quantize=quant)(batch))
        np.testing.assert_allclose(got, want, atol=1e-5)
