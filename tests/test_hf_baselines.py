"""Faithful VisualBERT / ViLT backbones vs the torch `transformers`
implementations at ported weights (random small configs — no network).

These are the REAL architectures behind the reference's Table-2 baselines
(`meant/hf_wrapper.py:7-72`), replacing round-1's RoBERTa-backbone
lookalikes."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # torch transformers oracle

import torch

import jax.numpy as jnp

from meant_tpu.utils import port


def test_visual_bert_parity():
    from transformers import VisualBertConfig
    from transformers.models.visual_bert.modeling_visual_bert import \
        VisualBertModel as TorchVB

    torch.manual_seed(0)
    cfg = VisualBertConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        visual_embedding_dim=32, max_position_embeddings=64,
        type_vocab_size=2, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    ref = TorchVB(cfg).eval()

    rng = np.random.RandomState(0)
    b, s, nv = 2, 10, 6
    input_ids = rng.randint(0, 120, size=(b, s)).astype(np.int64)
    # the wrapper's quirky inputs: token_type ones, text attention ZEROS
    token_type = np.ones((b, s), np.int64)
    attn = np.zeros((b, s), np.float32)
    visual = rng.randn(b, nv, 32).astype(np.float32)
    with torch.no_grad():
        out = ref(input_ids=torch.tensor(input_ids),
                  token_type_ids=torch.tensor(token_type),
                  attention_mask=torch.tensor(attn),
                  visual_embeds=torch.tensor(visual),
                  visual_token_type_ids=torch.ones(b, nv, dtype=torch.long),
                  visual_attention_mask=torch.ones(b, nv))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    from meant_tpu.nn.hf_baselines import VisualBertModel
    params = port.import_visual_bert(dict(ref.state_dict()), num_layers=2,
                                     num_heads=4)
    model = VisualBertModel(vocab_size=120, hidden_size=48, num_layers=2,
                            num_heads=4, intermediate_size=96,
                            visual_embedding_dim=32,
                            max_position_embeddings=64, dropout=0.0)
    hidden, pooled = model.apply(
        {"params": params}, jnp.asarray(input_ids.astype(np.int32)),
        attention_mask=jnp.asarray(attn),
        token_type_ids=jnp.asarray(token_type.astype(np.int32)),
        visual_embeds=jnp.asarray(visual))
    assert np.abs(np.asarray(hidden) - ref_hidden).max() <= 1e-3
    assert np.abs(np.asarray(pooled) - ref_pooled).max() <= 1e-3


def test_vilt_parity():
    from transformers import ViltConfig
    from transformers.models.vilt.modeling_vilt import ViltModel as TorchVilt

    torch.manual_seed(1)
    cfg = ViltConfig(
        vocab_size=150, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=32, type_vocab_size=2,
        modality_type_vocab_size=2, image_size=64, patch_size=16,
        num_channels=3, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, max_image_length=-1)
    ref = TorchVilt(cfg).eval()

    rng = np.random.RandomState(1)
    b, s = 2, 8
    input_ids = rng.randint(0, 150, size=(b, s)).astype(np.int64)
    token_type = np.ones((b, s), np.int64)
    attn = np.zeros((b, s), np.float32)
    pixels = rng.randn(b, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        out = ref(input_ids=torch.tensor(input_ids),
                  token_type_ids=torch.tensor(token_type),
                  attention_mask=torch.tensor(attn),
                  pixel_values=torch.tensor(pixels),
                  pixel_mask=torch.ones(b, 64, 64, dtype=torch.long))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    from meant_tpu.nn.hf_baselines import ViltModel
    params = port.import_vilt(dict(ref.state_dict()), num_layers=2,
                              num_heads=4)
    model = ViltModel(vocab_size=150, hidden_size=48, num_layers=2,
                      num_heads=4, intermediate_size=96,
                      max_position_embeddings=32, image_size=64,
                      patch_size=16, dropout=0.0)
    hidden, pooled = model.apply(
        {"params": params}, jnp.asarray(input_ids.astype(np.int32)),
        jnp.asarray(pixels),
        attention_mask=jnp.asarray(attn),
        token_type_ids=jnp.asarray(token_type.astype(np.int32)))
    # the torch implementation SHUFFLES patch tokens (uniform multinomial
    # permutation in visual_embed) — cls/text rows and the pooled output
    # are permutation-invariant; compare those.
    assert np.abs(np.asarray(pooled) - ref_pooled).max() <= 1e-3
    assert np.abs(np.asarray(hidden)[:, :s + 1]
                  - ref_hidden[:, :s + 1]).max() <= 1e-3


def test_vilt_position_resize_matches_torch():
    """align-corners bilinear resize of the position grid (config 4x4 grid
    -> 2x2 actual grid at image 32/patch 16) vs torch interpolate."""
    import torch.nn.functional as F
    from meant_tpu.nn.hf_baselines import _resize_bilinear_align_corners
    rng = np.random.RandomState(2)
    x = rng.randn(5, 4, 4).astype(np.float32)
    want = F.interpolate(torch.tensor(x)[None], size=(2, 3),
                         mode="bilinear", align_corners=True)[0].numpy()
    got = np.asarray(_resize_bilinear_align_corners(jnp.asarray(x), 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
