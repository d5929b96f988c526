"""DEFECTS #23 repair: MlpHead(logits=True) / model logits_head flags.

The reference head is [norm, Linear, Sigmoid] fed into CrossEntropyLoss
(`meant/meant.py:204` + `in_loop_train.py:232`): sigmoid bounds the logit
gap to 1 (loss floor log(1+e^-1) ~= 0.3133) and saturates — once both
sigmoids pin at 0/1 the gradient through the head vanishes and training
freezes at loss ln 2 (measured envelope in DEFECTS #23). The repair skips
the sigmoid; same params, same trainer loss.
"""

import numpy as np

import jax
import jax.numpy as jnp

from meant_tpu.models.meant import MlpHead
from meant_tpu.train.classify import sigmoid_ce_loss


def _head_pair(dim=8, classes=2):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 1, dim).astype(np.float32))
    sig = MlpHead(dim, classes, norm="layer")
    log = MlpHead(dim, classes, norm="layer", logits=True)
    params = sig.init(jax.random.PRNGKey(0), x)["params"]
    return sig, log, params, x


def test_logits_head_shares_params_and_drops_sigmoid():
    sig, log, params, x = _head_pair()
    out_s = sig.apply({"params": params}, x)
    out_l = log.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_s),
                               jax.nn.sigmoid(np.asarray(out_l)), atol=1e-6)
    # sigmoid outputs live in (0,1); the repair is unbounded
    assert np.asarray(out_s).min() > 0 and np.asarray(out_s).max() < 1


def test_saturated_sigmoid_kills_gradients_logits_do_not():
    """Push the pre-activation to saturation: the sigmoid head's loss
    gradient wrt the input collapses to ~0 (the measured lr>=5e-4 freeze);
    the logits head keeps a healthy gradient."""
    sig, log, params, x = _head_pair()
    # blow up the projection weights so the pre-activations saturate (the
    # LayerNorm ahead of the Linear would undo mere input scaling)
    params = jax.tree.map(lambda a: a, params)
    params["proj"]["dense"]["kernel"] = \
        params["proj"]["dense"]["kernel"] * 300.0
    x_sat = x
    # label every sample with the class the head does NOT predict: a
    # healthy head must push hard on these; the saturated sigmoid cannot
    # (grad ~ sigmoid'(z) -> 0 regardless of how wrong the prediction is)
    pred = jnp.argmax(
        log.apply({"params": params}, x_sat).squeeze(axis=1), axis=-1)
    labels = (1 - pred).astype(jnp.int32)

    def loss(head):
        def f(xin):
            out = head.apply({"params": params}, xin).squeeze(axis=1)
            return sigmoid_ce_loss(out, labels)
        return f

    g_sig = jax.grad(loss(sig))(x_sat)
    g_log = jax.grad(loss(log))(x_sat)
    assert float(jnp.abs(g_sig).max()) < 1e-6, "sigmoid head not saturated?"
    assert float(jnp.abs(g_log).max()) > 1e-4, "logits head lost gradient"
    # and the sigmoid loss is pinned at its ln2 freeze point
    out_s = sig.apply({"params": params}, x_sat).squeeze(axis=1)
    ls = float(sigmoid_ce_loss(out_s, labels))
    assert abs(ls - np.log(2.0)) < 0.35  # near the saturation plateau


def test_models_thread_logits_head():
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.models.meant_src import meant_src

    rng = np.random.RandomState(0)
    b, lag, s = 2, 2, 16
    emb = EmbeddingConfig(vocab_size=50, hidden_size=32,
                          max_position_embeddings=40, dropout=0.0)
    kw = dict(text_dim=32, image_dim=32, price_dim=4, height=32, width=32,
              patch_res=16, lag=lag, num_classes=2, embedding=emb,
              num_heads=4, num_encoders=1, channels=4)
    tw = jnp.asarray(rng.randint(2, 50, (b, lag, s)), jnp.int32)
    im = jnp.asarray(rng.randn(b, lag, 4, 32, 32), jnp.float32)
    m0 = meant(**kw)
    m1 = meant(**kw, logits_head=True)
    p = m0.init(jax.random.PRNGKey(0), tw, im)["params"]
    o0 = m0.apply({"params": p}, tw, im)
    o1 = m1.apply({"params": p}, tw, im)
    np.testing.assert_allclose(np.asarray(o0),
                               jax.nn.sigmoid(np.asarray(o1)), atol=1e-6)

    kw_src = dict(text_dim=32, image_dim=32, price_dim=4, height=32,
                  width=32, patch_res=16, lag=lag, num_classes=2,
                  embedding=emb, num_heads=4, num_encoders=1, channels=4,
                  seq_len=s)
    s0 = meant_src(**kw_src)
    s1 = meant_src(**kw_src, logits_head=True)
    pr = jnp.asarray(rng.randn(b, lag, 4), jnp.float32)
    ps = s0.init(jax.random.PRNGKey(0), tw, im, pr)["params"]
    np.testing.assert_allclose(
        np.asarray(s0.apply({"params": ps}, tw, im, pr)),
        jax.nn.sigmoid(np.asarray(s1.apply({"params": ps}, tw, im, pr))),
        atol=1e-6)
