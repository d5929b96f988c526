"""Faithful VisualBERT and ViLT backbones (linen).

The reference's Table-2 / F1-0.6813 baselines wrap the REAL HF
architectures (`meant/hf_wrapper.py:7-72`): `VisualBertModel` fed
patch-Linear `visual_embeds`, and `ViltModel` with its patch conv swapped to
4 channels. These are those architectures rebuilt in flax, verified against
the torch `transformers` implementations at ported weights
(tests/test_hf_baselines.py); weights import from local HF caches via
meant_tpu.utils.port.import_visual_bert / import_vilt when available.

VisualBERT (`transformers/models/visual_bert/modeling_visual_bert.py`):
  * text: word + position(arange) + token_type embeddings;
  * visual: visual_projection(visual_embeds) + visual_position(ids=0) +
    visual_token_type(ids=1) embeddings;
  * LayerNorm + dropout over the CONCATENATED stream, then a standard
    post-LN BERT encoder and a tanh pooler on token 0.

ViLT (`transformers/models/vilt/modeling_vilt.py`):
  * text: BERT-style TextEmbeddings;
  * image: conv patch embedding (k = s = patch_size), cls token, learned
    position embeddings bilinearly resized (align_corners) from the config
    grid to the actual patch grid;
  * modality-type embeddings ADDED AFTER each stream's own embeddings
    (text idx 0, image idx 1); pre-LN ViT encoder, final LayerNorm, tanh
    pooler on token 0.
  * The torch implementation shuffles patch order via a uniform
    `torch.multinomial` draw (`modeling_vilt.py` visual_embed) — attention
    is permutation-invariant over non-cls keys given consistently permuted
    position embeddings, so natural order here is mathematically identical.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.nn.layers import gelu
from meant_tpu.nn.roberta import RobertaLayer


def _resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True semantics over the last two
    axes of (c, h, w) — matches torch nn.functional.interpolate(...,
    mode='bilinear', align_corners=True)."""
    c, h, w = x.shape
    if (h, w) == (out_h, out_w):
        return x

    def axis_weights(src, dst):
        if dst == 1:
            return jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32), \
                jnp.zeros((1,))
        pos = jnp.arange(dst) * (src - 1) / (dst - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 1)
        hi = jnp.clip(lo + 1, 0, src - 1)
        return lo, hi, pos - lo

    hlo, hhi, hw = axis_weights(h, out_h)
    wlo, whi, ww = axis_weights(w, out_w)
    top = x[:, hlo][:, :, wlo] * (1 - ww) + x[:, hlo][:, :, whi] * ww
    bot = x[:, hhi][:, :, wlo] * (1 - ww) + x[:, hhi][:, :, whi] * ww
    return top * (1 - hw[:, None]) + bot * hw[:, None]


class BertTextEmbeddings(nn.Module):
    """BERT-style embeddings: arange positions (unlike RoBERTa's pad-offset
    convention). LayerNorm/dropout optional — VisualBERT norms the
    concatenated text+visual stream instead."""
    vocab_size: int
    hidden_size: int
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    apply_norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None,
                 deterministic: bool = True):
        s = input_ids.shape[1]
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (self.vocab_size, self.hidden_size))
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (self.max_position_embeddings, self.hidden_size))
        tok = self.param("token_type_embeddings",
                         nn.initializers.normal(0.02),
                         (self.type_vocab_size, self.hidden_size))
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = word[input_ids] + pos[None, :s] + tok[token_type_ids]
        if self.apply_norm:
            x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm")(x)
            x = nn.Dropout(self.dropout, name="drop")(
                x, deterministic=deterministic)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return x


class VisualBertModel(nn.Module):
    """`VisualBertModel` (HF) forward parity at ported weights."""
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    visual_embedding_dim: int = 2048
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 visual_embeds=None, visual_attention_mask=None,
                 visual_token_type_ids=None, deterministic: bool = True):
        text = BertTextEmbeddings(
            self.vocab_size, self.hidden_size,
            self.max_position_embeddings, self.type_vocab_size,
            self.layer_norm_eps, apply_norm=False, dtype=self.dtype,
            name="text_embeddings")(input_ids, token_type_ids,
                                    deterministic=deterministic)
        if visual_embeds is not None:
            n_vis = visual_embeds.shape[1]
            vis = nn.Dense(self.hidden_size, dtype=self.dtype,
                           name="visual_projection")(visual_embeds)
            vis_pos = self.param("visual_position_embeddings",
                                 nn.initializers.normal(0.02),
                                 (self.max_position_embeddings,
                                  self.hidden_size))
            vis_tok = self.param("visual_token_type_embeddings",
                                 nn.initializers.normal(0.02),
                                 (self.type_vocab_size, self.hidden_size))
            if visual_token_type_ids is None:
                visual_token_type_ids = jnp.ones(
                    visual_embeds.shape[:-1], jnp.int32)
            # visual position ids are ZEROS (no image_text_alignment path)
            vis = vis + vis_pos[None, :1] + vis_tok[visual_token_type_ids]
            x = jnp.concatenate((text, vis.astype(text.dtype)), axis=1)
            if attention_mask is None:
                attention_mask = jnp.ones(input_ids.shape, jnp.float32)
            if visual_attention_mask is None:
                visual_attention_mask = jnp.ones((x.shape[0], n_vis),
                                                 jnp.float32)
            mask = jnp.concatenate(
                (attention_mask.astype(jnp.float32),
                 visual_attention_mask.astype(jnp.float32)), axis=1)
        else:
            x = text
            mask = attention_mask
        x = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="embeddings_norm")(x)
        x = nn.Dropout(self.dropout, name="embeddings_drop")(
            x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = RobertaLayer(self.hidden_size, self.num_heads,
                             self.intermediate_size, self.dropout,
                             self.layer_norm_eps, dtype=self.dtype,
                             name=f"layer_{i}")(
                x, mask, deterministic=deterministic)
        pooled = jnp.tanh(nn.Dense(self.hidden_size, dtype=self.dtype,
                                   name="pooler")(x[:, 0]))
        return x, pooled


class ViltLayer(nn.Module):
    """Pre-LN ViT block (`modeling_vilt.py` ViltLayer)."""
    hidden_size: int
    num_heads: int = 12
    intermediate_size: int = 3072
    dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True):
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :] > 0
        h = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="layernorm_before")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            name="attention")(h, h, mask=mask)
        h = nn.Dropout(self.dropout, name="attn_drop")(
            h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="layernorm_after")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     name="intermediate")(h)
        h = gelu(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout, name="out_drop")(
            h, deterministic=deterministic)
        return x + h


class ViltModel(nn.Module):
    """`ViltModel` (HF) forward parity at ported weights. Natural patch
    order (see module docstring on the torch shuffle)."""
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 40
    type_vocab_size: int = 2
    modality_type_vocab_size: int = 2
    image_size: int = 384            # config grid for position embeddings
    patch_size: int = 32
    num_channels: int = 3
    layer_norm_eps: float = 1e-12
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, pixel_values, attention_mask=None,
                 token_type_ids=None, deterministic: bool = True):
        b = input_ids.shape[0]
        text = BertTextEmbeddings(
            self.vocab_size, self.hidden_size,
            self.max_position_embeddings, self.type_vocab_size,
            self.layer_norm_eps, self.dropout, apply_norm=True,
            dtype=self.dtype, name="text_embeddings")(
                input_ids, token_type_ids, deterministic=deterministic)

        # conv patch embedding: k = s = patch_size over NCHW input
        patches = nn.Conv(self.hidden_size,
                          (self.patch_size, self.patch_size),
                          strides=(self.patch_size, self.patch_size),
                          dtype=self.dtype, name="patch_projection")(
            pixel_values.transpose(0, 2, 3, 1))      # -> (b, gh, gw, d)
        gh, gw = patches.shape[1], patches.shape[2]
        grid = self.image_size // self.patch_size
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, grid * grid + 1, self.hidden_size))
        spatial = pos[0, 1:].T.reshape(self.hidden_size, grid, grid)
        spatial = _resize_bilinear_align_corners(spatial, gh, gw)
        spatial = spatial.reshape(self.hidden_size, gh * gw).T
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.hidden_size))
        img = patches.reshape(b, gh * gw, self.hidden_size) + spatial[None]
        img = jnp.concatenate(
            (jnp.broadcast_to(cls + pos[:, :1], (b, 1, self.hidden_size))
             .astype(img.dtype), img), axis=1)
        img = nn.Dropout(self.dropout, name="img_drop")(
            img, deterministic=deterministic)

        modality = self.param("token_type_embeddings",
                              nn.initializers.normal(0.02),
                              (self.modality_type_vocab_size,
                               self.hidden_size))
        text = text + modality[0]
        img = img + modality[1].astype(img.dtype)
        x = jnp.concatenate((text, img.astype(text.dtype)), axis=1)
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.float32)
        mask = jnp.concatenate(
            (attention_mask.astype(jnp.float32),
             jnp.ones((b, img.shape[1]), jnp.float32)), axis=1)

        for i in range(self.num_layers):
            x = ViltLayer(self.hidden_size, self.num_heads,
                          self.intermediate_size, self.dropout,
                          self.layer_norm_eps, dtype=self.dtype,
                          name=f"layer_{i}")(x, mask,
                                             deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layernorm")(x)
        pooled = jnp.tanh(nn.Dense(self.hidden_size, dtype=self.dtype,
                                   name="pooler")(x[:, 0]))
        return x, pooled
