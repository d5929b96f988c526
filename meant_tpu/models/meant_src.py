"""src-era MEANT variants (the TempStockLarge / Stocknet generation).

kwargs-batch forward APIs mirroring `src/meant/*` (`forward(**batch)` reading
input_ids / pixels / prices / attention_mask — `src/trainer.py:236-243`).

DOCUMENTED REFERENCE DEFECT replicated behind a flag: the learned projection
fusion (`src/meant/meant.py:250-259`) is `Linear(seq_len, 1) -> LayerNorm(1)
-> GELU`. LayerNorm over a singleton feature maps every input to its bias
(zero-init), so at init the text/image branches contribute a CONSTANT —
`gelu(bias)` — to the temporal stage (the reference's own "why is my entire
batch returning the same output" comment, `src/meant/temporal.py:40`).
`fixed_proj=True` (default False = bug-faithful) drops the LayerNorm so the
projection actually transmits information.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu import ops
from meant_tpu.models.meant import (EmbeddingConfig, MlpHead, _embedding,
                                    _lang_tower, _vision_tower)
from meant_tpu.nn.encoders import (LanguageEncoder, TemporalEncoder,
                                   VisionEncoder)
from meant_tpu.nn.layers import Linear, gelu, make_norm


class SeqProjection(nn.Module):
    """lang_proj / image_proj (`src/meant/meant.py:250-259`): project the
    sequence axis to 1. Input (b, l, d, s) -> (b, l, d)."""
    seq_len: int
    fixed: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = Linear(1, self.seq_len, init_style="torch", dtype=self.dtype,
                   name="proj")(x)
        if self.fixed:
            x = gelu(x)
        else:
            # bug-faithful: LayerNorm over the singleton feature == bias
            x = make_norm("layer", 1, "norm")(x)
            x = gelu(x)
        return x.squeeze(-1)


class meant_src(nn.Module):
    """src-era meant (`src/meant/meant.py:197-311`): LayerNorm+xavier
    encoders, learned sequence-projection fusion, src temporal (flat output),
    temporal dim = text + price + image.

    forward(**batch) with input_ids (b, lag, s), pixels (b, lag, c, H, W),
    prices (b, lag, price_dim), attention_mask (b, lag, s).
    """
    text_dim: int
    image_dim: int
    price_dim: int
    height: int
    width: int
    patch_res: int
    lag: int
    num_classes: int
    embedding: EmbeddingConfig = EmbeddingConfig()
    flash: bool = False
    num_heads: int = 8
    num_encoders: int = 1
    channels: int = 3
    seq_len: int = 512
    fixed_proj: bool = False
    logits_head: bool = False  # DEFECTS #23 repair: logits, not sigmoid
    # rematerialize encoder blocks: False | True/'full' | 'dots' (selective —
    # matmul outputs saved, elementwise tail recomputed; see nn/stack.py)
    remat: Any = False
    # roll each encoder tower into ONE lax.scan over layer-stacked params:
    # O(1)-in-depth program size / compile time for deep configs (meant-30).
    # Param layout changes to languageEncoders_scan / visionEncoders_scan
    # with a leading layer axis — see nn/stack.stack_encoder_params.
    scan_layers: bool = False
    # per-branch flash override (None = follow `flash`): the Pallas kernel
    # wins for the 512-token text branch but loses to XLA attention at the
    # 196-patch vision length (measured on v5e — see README perf matrix)
    flash_text: Optional[bool] = None
    flash_vision: Optional[bool] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids=None, pixels=None, prices=None,
                 attention_mask=None, labels=None, deterministic: bool = True,
                 **_):
        b = pixels.shape[0]
        lag, s = input_ids.shape[1], input_ids.shape[2]
        words = input_ids.reshape(b * lag, s)
        words = _embedding(self.embedding, self.dtype)(
            words, deterministic=deterministic)
        if attention_mask is not None:
            attention_mask = attention_mask.reshape(b * lag, s)
        flash_text = (self.flash if self.flash_text is None
                      else self.flash_text)
        flash_vision = (self.flash if self.flash_vision is None
                        else self.flash_vision)
        # an UNrematerialized scan stacks every per-layer intermediate and
        # uses MORE HBM than the unrolled graph (measured: the 12+12 b16
        # flagship OOMs at 34.9G vs the 15.75G chip) — _lang_tower's scanned
        # body always remats, defaulting to the cheap 'dots' policy
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, norm="layer",
            ff_norm2="rms", init_style="xavier", flash=flash_text,
            dtype=self.dtype), attention_mask, deterministic)
        # (b*l, s, d) -> (b, l, d, s), zero-pad seq to seq_len
        words = words.reshape(b, lag, s, self.text_dim).transpose(0, 1, 3, 2)
        if s < self.seq_len:
            words = jnp.pad(words, ((0, 0), (0, 0), (0, 0),
                                    (0, self.seq_len - s)))
        words = SeqProjection(self.seq_len, fixed=self.fixed_proj,
                              dtype=self.dtype, name="lang_proj")(words)

        imgs = pixels.reshape(b * lag, *pixels.shape[2:])
        imgs = ops.patchify(imgs, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        imgs = Linear(self.image_dim, patch_dim, init_style="torch",
                      dtype=self.dtype, name="patchEmbed")(imgs)
        imgs = _vision_tower(imgs, self, dict(
            dim=self.image_dim, num_heads=self.num_heads, norm="layer",
            ff_norm2="rms", init_style="xavier", flash=flash_vision,
            dtype=self.dtype), deterministic)
        n = imgs.shape[1]
        imgs = imgs.reshape(b, lag, n, self.image_dim).transpose(0, 1, 3, 2)
        imgs = SeqProjection(n, fixed=self.fixed_proj, dtype=self.dtype,
                             name="image_proj")(imgs)

        dim = self.text_dim + self.price_dim + self.image_dim
        fused = jnp.concatenate(
            (words, imgs, prices.astype(words.dtype)), axis=2)
        if self.dtype is not None:
            fused = fused.astype(self.dtype)  # reference `.half()` cast
        fused = TemporalEncoder(dim, self.num_heads, self.lag, style="src",
                                dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        return MlpHead(dim, self.num_classes, norm="layer",
                       logits=self.logits_head, dtype=self.dtype,
                       name="mlpHead")(fused)


class meantTweetPrice(nn.Module):
    """Text+price model (`src/meant/meant_tweet_price.py:139-219`): RMSNorm
    languageEncoder (dropout 0.4 in both blocks), mean-pooled text concat
    prices, stackable temporal encoders (reference crashes for >1 — one is
    supported faithfully), LayerNorm head.

    forward(tweets (b, lag, s), prices (b, lag, price_dim), attention_mask).
    """
    text_dim: int
    price_dim: int
    lag: int
    num_classes: int
    embedding: EmbeddingConfig = EmbeddingConfig()
    sequence_length: int = 128
    flash: bool = False
    num_heads: int = 8
    num_encoders: int = 1
    num_temporal_encoders: int = 1
    channels: int = 4
    pool: str = "mean"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, prices, attention_mask=None,
                 deterministic: bool = True):
        assert self.num_temporal_encoders == 1, (
            "the reference's temporal stacking is shape-incompatible for >1 "
            "(src/meant/meant_tweet_price.py:171); one encoder supported")
        b, lag, s = tweets.shape
        words = tweets.reshape(b * lag, s)
        if attention_mask is not None:
            attention_mask = attention_mask.reshape(b * lag, s)
        words = _embedding(self.embedding, self.dtype)(
            words, deterministic=deterministic)
        for i in range(self.num_encoders):
            words = LanguageEncoder(
                self.text_dim, self.num_heads, dropout=0.4, ff_dropout=0.4,
                norm="rms", flash=self.flash, dtype=self.dtype,
                name=f"languageEncoders_{i}")(
                    words, attention_mask, deterministic=deterministic)
        words = words.reshape(b, lag, s, self.text_dim)
        dim = self.text_dim + self.price_dim
        fused = jnp.concatenate(
            (jnp.mean(words, axis=2), prices.astype(words.dtype)), axis=2)
        fused = TemporalEncoder(dim, self.num_heads, self.lag,
                                style="tweet_price", dtype=self.dtype,
                                name="temporal_encoding_0")(
                                    fused, deterministic=deterministic)
        return MlpHead(dim, self.num_classes, norm="layer", dtype=self.dtype,
                       name="mlpHead")(fused)


class meant_price(nn.Module):
    """Price-only temporal model (`src/meant/meantPrice.py:67-100`):
    5-dim MACD features -> norm-free src temporalEncoder (the reference's
    LayerNorms are commented out) -> LayerNorm head. num_heads defaults to 8
    like the reference — with price_dim 5 the head dim clamps to 1 and
    atten_size becomes 8 (`src/meant/temporal.py:18-20`).
    forward(**batch) reading prices (b, lag, price_dim)."""
    price_dim: int
    lag: int
    num_classes: int
    num_heads: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, prices=None, deterministic: bool = True, **_):
        fused = TemporalEncoder(self.price_dim, self.num_heads, self.lag,
                                style="src_slim", dtype=self.dtype,
                                name="temporal_encoding_0")(prices)
        return MlpHead(self.price_dim, self.num_classes, norm="layer",
                       dtype=self.dtype, name="mlpHead")(fused)


class mlpEncoder(nn.Module):
    """Deep-MLP price baseline (`src/meant/simple_mlp.py:5-28`)."""
    input_dim: int
    output_dim: int
    hidden_dim: int
    num_hidden_layers: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, prices=None, deterministic: bool = True, **_):
        x = Linear(self.hidden_dim, self.input_dim, init_style="xavier",
                   dtype=self.dtype, name="input_layer")(prices)
        x = make_norm("layer", self.hidden_dim, "input_norm")(x)
        x = jax.nn.relu(x)
        for i in range(self.num_hidden_layers):
            x = Linear(self.hidden_dim, self.hidden_dim, init_style="xavier",
                       dtype=self.dtype, name=f"hidden_{i}")(x)
            x = make_norm("layer", self.hidden_dim, f"hidden_norm_{i}")(x)
            x = jax.nn.relu(x)
        x = Linear(self.output_dim, self.hidden_dim, init_style="xavier",
                   dtype=self.dtype, name="output_layer")(x)
        return jax.nn.sigmoid(x)


class LSTMEncoder(nn.Module):
    """LSTM price baseline (`src/meant/simple_mlp.py:31-49`): Linear+LN+ReLU
    -> num_hidden_layers-stacked LSTM -> sigmoid head.

    DOCUMENTED REFERENCE DEFECT (default-on): the reference feeds
    (batch, lag, hidden) to `nn.LSTM` WITHOUT batch_first, so torch treats
    the BATCH axis as time and the lag axis as batch — recurrence runs
    across batch elements. `torch_axis_quirk=False` scans over lag (the
    intended semantics)."""
    input_dim: int
    output_dim: int
    hidden_dim: int
    num_hidden_layers: int = 3
    torch_axis_quirk: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, prices=None, deterministic: bool = True, **_):
        x = Linear(self.hidden_dim, self.input_dim, init_style="xavier",
                   dtype=self.dtype, name="input_layer")(prices)
        x = make_norm("layer", self.hidden_dim, "input_norm")(x)
        x = jax.nn.relu(x)
        axis = 0 if self.torch_axis_quirk else 1
        for i in range(self.num_hidden_layers):
            scan = nn.scan(nn.OptimizedLSTMCell, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=axis,
                           out_axes=axis)(self.hidden_dim, name=f"lstm_{i}")
            batch_shape = (x.shape[1 - axis], self.hidden_dim)
            carry = (jnp.zeros(batch_shape, x.dtype),
                     jnp.zeros(batch_shape, x.dtype))
            carry, x = scan(carry, x)
        x = Linear(self.output_dim, self.hidden_dim, init_style="xavier",
                   dtype=self.dtype, name="output_layer")(x)
        return jax.nn.sigmoid(x)
