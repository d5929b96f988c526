"""RoBERTa-style transformer encoder (linen) — backbone for the HF-wrapper
equivalents (`meant/hf_wrapper.py`): bertweet_wrapper, roberta_mlm_wrapper,
and the VisualBERT/ViLT-style multimodal baselines.

Standard post-LN BERT encoder: embeddings (meant_tpu.nn.embeddings) ->
N x [MHA -> Add&LN -> FF(gelu) -> Add&LN] -> tanh pooler over token 0.
Weights import from HF torch checkpoints via meant_tpu.utils.port
(no-network environments run random-init — same as the reference when
`--pretrained false`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.nn.embeddings import RobertaEmbeddings
from meant_tpu.nn.layers import gelu


class RobertaLayer(nn.Module):
    hidden_size: int
    num_heads: int = 12
    intermediate_size: int = 3072
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True):
        mask = None
        if attention_mask is not None:
            mask = attention_mask[:, None, None, :] > 0
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            name="attention")(x, x, mask=mask)
        h = nn.Dropout(self.dropout, name="attn_drop")(
            h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="attention_norm")(x + h)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        h = gelu(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout, name="out_drop")(
            h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=self.layer_norm_eps,
                            name="output_norm")(x + h)


class RobertaModel(nn.Module):
    vocab_size: int = 64001
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 130
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids=None, attention_mask=None,
                 inputs_embeds=None, deterministic: bool = True,
                 return_pooled: bool = True):
        if inputs_embeds is None:
            x = RobertaEmbeddings(
                vocab_size=self.vocab_size, hidden_size=self.hidden_size,
                max_position_embeddings=self.max_position_embeddings,
                dropout=self.dropout, dtype=self.dtype,
                name="embeddings")(input_ids, deterministic=deterministic)
        else:
            x = inputs_embeds
        for i in range(self.num_layers):
            x = RobertaLayer(self.hidden_size, self.num_heads,
                             self.intermediate_size, self.dropout,
                             dtype=self.dtype, name=f"layer_{i}")(
                x, attention_mask, deterministic=deterministic)
        if not return_pooled:
            return x
        pooled = nn.Dense(self.hidden_size, dtype=self.dtype,
                          name="pooler")(x[:, 0])
        return x, jnp.tanh(pooled)


class bertweet_wrapper(nn.Module):
    """`meant/hf_wrapper.py:75-90`: bertweet -> pooler -> dropout ->
    [LayerNorm, GELU, Linear, Sigmoid]. Attention mask derived from pad id 1
    (the bertweet pad wrinkle, `hf_wrapper.py:83`)."""
    input_dim: int = 768
    output_dim: int = 2
    vocab_size: int = 64001
    num_layers: int = 12
    num_heads: int = 12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, deterministic: bool = True):
        attention_mask = (tweets != 1).astype(jnp.float32)
        _, pooled = RobertaModel(
            vocab_size=self.vocab_size, hidden_size=self.input_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=4 * self.input_dim, dtype=self.dtype,
            name="bertweet")(tweets, attention_mask,
                             deterministic=deterministic)
        pooled = nn.Dropout(0.1, name="drop")(pooled,
                                              deterministic=deterministic)
        x = nn.LayerNorm(name="head_norm")(pooled)
        x = gelu(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="head")(x)
        return jax.nn.sigmoid(x)


class roberta_mlm_wrapper(nn.Module):
    """`meant/hf_wrapper.py:96-109`: roberta last_hidden_state ->
    Linear(hidden, 1) -> squeeze."""
    input_dim: int = 768
    output_dim: int = 512
    vocab_size: int = 64001
    num_layers: int = 12
    num_heads: int = 12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 deterministic: bool = True):
        hidden = RobertaModel(
            vocab_size=self.vocab_size, hidden_size=self.input_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=4 * self.input_dim, dtype=self.dtype,
            name="roberta")(input_ids, attention_mask,
                            deterministic=deterministic,
                            return_pooled=False)
        out = nn.Dense(1, dtype=self.dtype, name="mlm_output_head")(hidden)
        return out.squeeze(-1)


class vl_BERT_Wrapper(nn.Module):
    """vl_BERT_Wrapper (`meant/hf_wrapper.py:7-39`) around the FAITHFUL
    VisualBertModel (meant_tpu.nn.hf_baselines, torch-parity tested):
    4-channel 16x16 patches -> Linear(patch_dim, 2048) visual_embeds ->
    VisualBERT -> pooler -> dropout -> [Linear, Sigmoid].

    Reference I/O quirks preserved: token_type_ids of ONES for text, an
    all-ZERO text attention mask (`hf_wrapper.py:26`), visual token-type /
    attention all ones. Backbone weights import from an HF
    `VisualBertModel` checkpoint via port.import_visual_bert (geometry
    defaults = uclanlp/visualbert-vqa-coco-pre)."""
    input_dim: int = 768
    output_dim: int = 2
    vocab_size: int = 30522
    num_layers: int = 12
    num_heads: int = 12
    visual_embed_dim: int = 2048
    patch_res: int = 16
    channels: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, images, deterministic: bool = True):
        from meant_tpu.nn.hf_baselines import VisualBertModel
        from meant_tpu.ops import patchify
        patches = patchify(images, self.patch_res)
        visual = nn.Dense(self.visual_embed_dim, dtype=self.dtype,
                          name="patches")(patches)
        _, pooled = VisualBertModel(
            vocab_size=self.vocab_size, hidden_size=self.input_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=4 * self.input_dim,
            visual_embedding_dim=self.visual_embed_dim, dtype=self.dtype,
            name="model")(
                tweets,
                attention_mask=jnp.zeros(tweets.shape, jnp.float32),
                token_type_ids=jnp.ones(tweets.shape, jnp.int32),
                visual_embeds=visual, deterministic=deterministic)
        pooled = nn.Dropout(0.1, name="drop")(pooled,
                                              deterministic=deterministic)
        logits = nn.Dense(self.output_dim, dtype=self.dtype,
                          name="mlp_head")(pooled)
        return jax.nn.sigmoid(logits)


class ViltWrapper(nn.Module):
    """ViltWrapper (`meant/hf_wrapper.py:41-72`) around the FAITHFUL
    ViltModel (meant_tpu.nn.hf_baselines, torch-parity tested): the patch
    conv swapped to 4 channels exactly like the reference
    (`hf_wrapper.py:46` — that conv is random-init even with pretrained
    weights), pooler -> dropout -> [Linear, Sigmoid]. Text attention mask
    zero + token_type ones (reference quirks). Geometry defaults =
    dandelin/vilt-b32-mlm."""
    input_dim: int = 768
    output_dim: int = 2
    vocab_size: int = 30522
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 40
    image_size: int = 384
    patch_res: int = 32
    channels: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, images, deterministic: bool = True):
        from meant_tpu.nn.hf_baselines import ViltModel
        _, pooled = ViltModel(
            vocab_size=self.vocab_size, hidden_size=self.input_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=4 * self.input_dim,
            max_position_embeddings=self.max_position_embeddings,
            image_size=self.image_size, patch_size=self.patch_res,
            num_channels=self.channels, dtype=self.dtype, name="vilt")(
                tweets, images,
                attention_mask=jnp.zeros(tweets.shape, jnp.float32),
                token_type_ids=jnp.ones(tweets.shape, jnp.int32),
                deterministic=deterministic)
        pooled = nn.Dropout(0.1, name="drop")(pooled,
                                              deterministic=deterministic)
        logits = nn.Dense(self.output_dim, dtype=self.dtype,
                          name="mlp_head")(pooled)
        return jax.nn.sigmoid(logits)


class hug_roberta_mlm_wrapper(nn.Module):
    """`src/hug/pretrain_mlm.py:110-123`: roberta last_hidden_state ->
    [GELU, Linear(hidden, 1)] -> squeeze — one SCALAR per token (unlike the
    top-level wrapper at `meant/hf_wrapper.py:96-109`, which has no GELU).
    The hug harness trains it with CrossEntropyLoss against float labels —
    torch's probability-target mode over the SEQUENCE axis (degenerate
    "MLM"; replicated in cli/hug_pretrain_mlm)."""
    input_dim: int = 768
    vocab_size: int = 64001
    num_layers: int = 12
    num_heads: int = 12
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 deterministic: bool = True):
        hidden = RobertaModel(
            vocab_size=self.vocab_size, hidden_size=self.input_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=4 * self.input_dim, dtype=self.dtype,
            name="roberta")(input_ids, attention_mask,
                            deterministic=deterministic,
                            return_pooled=False)
        out = nn.Dense(1, dtype=self.dtype, name="mlm_output_head")(
            gelu(hidden))
        return out.squeeze(-1)
