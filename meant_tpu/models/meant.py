"""The MEANT model family — paper-generation (top-level reference tree).

Public constructor/field names mirror the reference so the harnesses port
unchanged (`meant/__init__.py:1-11`; ctor `meant/meant.py:149`). The torch
`embedding` module argument becomes an `EmbeddingConfig`; the tables live
under params['embedding'] and are grafted/imported via
meant_tpu.train.checkpoint / meant_tpu.utils.port.

TPU-first layout decision carried over from the reference (it is already the
right one): lag is folded into the batch axis for the per-day encoders
(`meant/meant.py:209` `words = tweets.view(b*lag, s)`), so all attention
matmuls are large and batched; the temporal stage then sees (b, lag, dim).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu import ops
from meant_tpu.nn.embeddings import RobertaEmbeddings
from meant_tpu.nn.encoders import (LanguageEncoder, TemporalEncoder,
                                   VisionEncoder)
from meant_tpu.nn.layers import Linear, make_norm
from meant_tpu.nn.stack import maybe_remat, scanned_stack


@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    vocab_size: int = 64001
    hidden_size: int = 768
    max_position_embeddings: int = 130
    type_vocab_size: int = 1
    padding_idx: int = 1
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1


def _embedding(cfg: EmbeddingConfig, dtype, name="embedding"):
    return RobertaEmbeddings(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size, padding_idx=cfg.padding_idx,
        layer_norm_eps=cfg.layer_norm_eps, dropout=cfg.dropout,
        dtype=dtype, name=name)


def _lang_tower(x, m, enc_kwargs, attention_mask, deterministic):
    """Depth-`m.num_encoders` LanguageEncoder tower, called inside the
    parent's @nn.compact: the unrolled python loop, or ONE lax.scan over
    layer-stacked params when `m.scan_layers` (nn/stack.py — O(1)-in-depth
    program size). `m.remat` picks the policy either way; a scanned body
    always remats (default 'dots') because an unrematerialized scan stacks
    every per-layer intermediate and uses MORE HBM than the unrolled graph."""
    if m.scan_layers:
        return scanned_stack(
            LanguageEncoder, m.num_encoders, enc_kwargs,
            name="languageEncoders_scan", n_ctx=1,
            remat=m.remat if m.remat else "dots")(
                x, attention_mask, deterministic)
    Enc = maybe_remat(LanguageEncoder, m.remat, static_argnums=(3,))
    for i in range(m.num_encoders):
        x = Enc(**enc_kwargs, name=f"languageEncoders_{i}")(
            x, attention_mask, deterministic)
    return x


def _vision_tower(x, m, enc_kwargs, deterministic):
    """VisionEncoder twin of _lang_tower (no mask ctx)."""
    if m.scan_layers:
        return scanned_stack(
            VisionEncoder, m.num_encoders, enc_kwargs,
            name="visionEncoders_scan",
            remat=m.remat if m.remat else "dots")(x, deterministic)
    Enc = maybe_remat(VisionEncoder, m.remat, static_argnums=(2,))
    for i in range(m.num_encoders):
        x = Enc(**enc_kwargs, name=f"visionEncoders_{i}")(x, deterministic)
    return x


class MlpHead(nn.Module):
    """[norm, Linear(dim, classes), Sigmoid] (`meant/meant.py:204`).

    NOTE the reference feeds these sigmoid outputs straight into
    CrossEntropyLoss (`in_loop_train.py:232`) — the head intentionally outputs
    probabilities-through-sigmoid, not logits, and the trainer replicates
    that loss convention.

    logits=True is the DEFECTS #23 repair: skip the sigmoid so softmax-CE
    sees unbounded logits — the sigmoid bounds logit gaps to 1 (loss floor
    log(1+e^-1)) and SATURATES at lr >= 5e-4 (dead gradients, loss pinned
    at ln 2). Same params, same trainer loss (log_softmax works on either).
    Parity default stays sigmoid.
    """
    dim: int
    num_classes: int
    norm: str = "rms"
    init_style: str = "torch"
    logits: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = make_norm(self.norm, self.dim, "norm")(x)
        x = Linear(self.num_classes, self.dim, init_style=self.init_style,
                   dtype=self.dtype, name="proj")(x)
        return x if self.logits else jax.nn.sigmoid(x)


class meant(nn.Module):
    """Full text+image MEANT, mean-pool fusion (`meant/meant.py:148-238`).

    forward(tweets (b, lag, s) int, images (b, lag, c, H, W),
            attention_mask (b, lag, s)) -> (b, num_classes)
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
    channels: int = 4
    # rematerialize encoder blocks: False | True/'full' | 'dots' (selective;
    # see nn/stack.py)
    remat: Any = False
    # ONE lax.scan per tower over layer-stacked params (nn/stack.py):
    # O(1)-in-depth compile time; layout languageEncoders_scan/
    # visionEncoders_scan
    scan_layers: bool = False
    # reference languageEncoder.encode2 uses nn.Dropout() == p=0.5
    # (`meant/meant.py:107`, DEFECTS #22); 0.0 disables it (fixed mode)
    ff_dropout: float = 0.5
    logits_head: bool = False  # DEFECTS #23 repair: logits, not sigmoid
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, images, attention_mask=None,
                 deterministic: bool = True):
        b = images.shape[0]
        lag, s = tweets.shape[1], tweets.shape[2]
        words = tweets.reshape(b * lag, s)
        words = _embedding(self.embedding, self.dtype)(
            words, deterministic=deterministic)
        if attention_mask is not None:
            attention_mask = attention_mask.reshape(b * lag, s)
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, flash=self.flash,
            ff_dropout=self.ff_dropout, dtype=self.dtype),
            attention_mask, deterministic)
        words = words.reshape(b, lag, s, self.text_dim)

        imgs = images.reshape(b * lag, *images.shape[2:])
        imgs = ops.patchify(imgs, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        imgs = Linear(self.image_dim, patch_dim, dtype=self.dtype,
                      name="patchEmbed")(imgs)
        imgs = _vision_tower(imgs, self, dict(
            dim=self.image_dim, num_heads=self.num_heads, flash=self.flash,
            dtype=self.dtype), deterministic)
        n = imgs.shape[1]
        imgs = imgs.reshape(b, lag, n, self.image_dim)

        fused = jnp.concatenate(
            (jnp.mean(words, axis=2), jnp.mean(imgs, axis=2)), axis=2)
        dim = self.text_dim + self.image_dim
        fused = TemporalEncoder(dim, self.num_heads, self.lag, style="paper",
                                dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        out = MlpHead(dim, self.num_classes, norm="rms",
                      logits=self.logits_head, dtype=self.dtype,
                      name="mlpHead")(fused)
        return out.squeeze(axis=1)


class meant_vision(nn.Module):
    """Image-only MEANT (`meant/meant_vision.py:107-165`).
    forward(images (b, lag, c, H, W)) -> (b, num_classes)."""
    image_dim: int
    price_dim: int
    height: int
    width: int
    patch_res: int
    lag: int
    num_classes: int
    flash: bool = False
    num_heads: int = 8
    num_encoders: int = 1
    channels: int = 4
    # scan_layers/remat: compile-time + HBM levers shared by every deep-tower
    # model — see nn/stack.py
    scan_layers: bool = False
    remat: Any = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        b, lag = images.shape[0], images.shape[1]
        imgs = images.reshape(b * lag, *images.shape[2:])
        imgs = ops.patchify(imgs, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        imgs = Linear(self.image_dim, patch_dim, dtype=self.dtype,
                      name="patchEmbed")(imgs)
        imgs = _vision_tower(imgs, self, dict(
            dim=self.image_dim, num_heads=self.num_heads, flash=self.flash,
            dtype=self.dtype), deterministic)
        imgs = imgs.reshape(b, lag, imgs.shape[1], self.image_dim)
        fused = jnp.mean(imgs, axis=2)
        fused = TemporalEncoder(self.image_dim, self.num_heads, self.lag,
                                style="slim", dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        out = MlpHead(self.image_dim, self.num_classes, norm="layer",
                      dtype=self.dtype, name="mlpHead")(fused)
        return out.squeeze(axis=1)


class meant_tweet(nn.Module):
    """Text-only MEANT (`meant/meant_tweet.py:114-166`). Implements the
    PATCHED encoder (the shipped file NameErrors at `meant_tweet.py:81`,
    defect §2.6.1). forward(tweets (b, lag, s), attention_mask) ->
    (b, num_classes)."""
    text_dim: int
    price_dim: int
    lag: int
    num_classes: int
    embedding: EmbeddingConfig = EmbeddingConfig()
    flash: bool = False
    num_heads: int = 8
    num_encoders: int = 1
    channels: int = 4
    ff_dropout: float = 0.5   # reference nn.Dropout() default (DEFECTS #22)
    scan_layers: bool = False   # nn/stack.py levers (the 12/24-encoder
    remat: Any = False          # grafting configs hit unrolled compile cost)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, attention_mask=None, deterministic: bool = True):
        b, lag, s = tweets.shape
        words = tweets.reshape(b * lag, s)
        if attention_mask is not None:
            attention_mask = attention_mask.reshape(b * lag, s)
        words = _embedding(self.embedding, self.dtype)(
            words, deterministic=deterministic)
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, flash=self.flash,
            ff_dropout=self.ff_dropout, dtype=self.dtype),
            attention_mask, deterministic)
        words = words.reshape(b, lag, s, self.text_dim)
        fused = jnp.mean(words, axis=2)  # "mean pooling works way better"
        fused = TemporalEncoder(self.text_dim, self.num_heads, self.lag,
                                style="slim", dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        out = MlpHead(self.text_dim, self.num_classes, norm="layer",
                      dtype=self.dtype, name="mlpHead")(fused)
        return out.squeeze(axis=1)


class meant_tweet_no_lag(nn.Module):
    """Single-day text ablation (`meant/meant_tweet_no_lag.py:61-116`):
    cls token prepended, LayerNorm encoders, head reads token 0.
    forward(tweets (b, s)) -> (b, num_classes)."""
    text_dim: int
    price_dim: int
    height: int
    width: int
    patch_res: int
    num_classes: int
    embedding: EmbeddingConfig = EmbeddingConfig()
    num_heads: int = 8
    num_encoders: int = 1
    channels: int = 4
    scan_layers: bool = False   # nn/stack.py levers
    remat: Any = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, deterministic: bool = True):
        b = tweets.shape[0]
        words = _embedding(self.embedding, self.dtype)(
            tweets, deterministic=deterministic)
        cls = self.param("txt_classtkn", nn.initializers.normal(1.0),
                         (1, 1, self.text_dim))
        words = jnp.concatenate(
            (jnp.broadcast_to(cls, (b, 1, self.text_dim)).astype(words.dtype),
             words), axis=1)
        # LayerNorm generation of languageEncoder, no flash, no mask,
        # no ff dropout (`meant_tweet_no_lag.py:28-58`).
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, norm="layer",
            ff_dropout=0.0, dtype=self.dtype), None, deterministic)
        pooled = words[:, 0, :]
        return MlpHead(self.text_dim, self.num_classes, norm="layer",
                       dtype=self.dtype, name="mlpHead")(pooled)


class meantPrice(nn.Module):
    """"Vanilla paper meant" with [cls]-token fusion and price features
    (`meant/meantPrice.py:118-210`): LayerNorm encoders, per-day cls tokens,
    temporal dim hard-coded 1540 (= 768 txt + 768 img + 4 price).

    forward(tweets (b, lag, s), images (b, lag, c, H, W), prices (b, lag, 4)).
    The per-day encoders run with lag folded into batch (the reference applies
    them to 4-D (b, lag, s, d) tensors, which its own einops patterns cannot
    actually process — intended semantics implemented).
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
    num_heads: int = 8
    num_encoders: int = 1
    channels: int = 4
    scan_layers: bool = False   # nn/stack.py levers
    remat: Any = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, images, prices, deterministic: bool = True):
        b, lag, s = tweets.shape
        words = tweets.reshape(b * lag, s)
        words = _embedding(self.embedding, self.dtype)(
            words, deterministic=deterministic)
        txt_cls = self.param("txt_classtkn", nn.initializers.normal(1.0),
                             (1, self.lag, 1, self.text_dim))
        words = words.reshape(b, lag, s, self.text_dim)
        words = jnp.concatenate(
            (jnp.broadcast_to(txt_cls, (b, lag, 1, self.text_dim)
                              ).astype(words.dtype), words), axis=2)
        words = words.reshape(b * lag, s + 1, self.text_dim)
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, norm="layer",
            ff_dropout=0.0, dtype=self.dtype), None, deterministic)
        words = words.reshape(b, lag, s + 1, self.text_dim)

        imgs = images.reshape(b * lag, *images.shape[2:])
        imgs = ops.patchify(imgs, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        imgs = Linear(self.image_dim, patch_dim, dtype=self.dtype,
                      name="patchEmbed")(imgs)
        n = imgs.shape[1]
        img_cls = self.param("img_classtkn", nn.initializers.normal(1.0),
                             (1, self.lag, 1, self.image_dim))
        imgs = imgs.reshape(b, lag, n, self.image_dim)
        imgs = jnp.concatenate(
            (jnp.broadcast_to(img_cls, (b, lag, 1, self.image_dim)
                              ).astype(imgs.dtype), imgs), axis=2)
        imgs = imgs.reshape(b * lag, n + 1, self.image_dim)
        imgs = _vision_tower(imgs, self, dict(
            dim=self.image_dim, num_heads=self.num_heads, norm="layer",
            dtype=self.dtype), deterministic)
        imgs = imgs.reshape(b, lag, n + 1, self.image_dim)

        dim = self.text_dim + self.image_dim + self.price_dim  # 1540
        fused = jnp.concatenate(
            (words[:, :, 0, :], imgs[:, :, 0, :],
             prices.astype(words.dtype)), axis=2).astype(jnp.float32)
        fused = TemporalEncoder(dim, self.num_heads, self.lag, style="slim",
                                name="temporal_encoding_0")(fused)
        out = MlpHead(dim, self.num_classes, norm="layer",
                      name="mlpHead")(fused)
        return out.squeeze(axis=1)


class meant_vqa(nn.Module):
    """VQA transfer model (`meant/meant_vqa.py:143-234`): single-frame text +
    image, mean-pool both, concat, head. (The reference's
    multimodal_encoding block is constructed but commented out of forward —
    not replicated.) forward(tweets (b, s), images (b, c, H, W))."""
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
    channels: int = 4
    scan_layers: bool = False   # nn/stack.py levers
    remat: Any = False
    # reference languageEncoder.encode2 nn.Dropout() == p=0.5 (DEFECTS #22)
    ff_dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, images, attention_mask=None,
                 deterministic: bool = True):
        words = _embedding(self.embedding, self.dtype)(
            tweets, deterministic=deterministic)
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, flash=self.flash,
            ff_dropout=self.ff_dropout, dtype=self.dtype),
            attention_mask, deterministic)
        imgs = ops.patchify(images, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        imgs = Linear(self.image_dim, patch_dim, dtype=self.dtype,
                      name="patchEmbed")(imgs)
        imgs = _vision_tower(imgs, self, dict(
            dim=self.image_dim, num_heads=self.num_heads, flash=self.flash,
            dtype=self.dtype), deterministic)
        fused = jnp.concatenate(
            (jnp.mean(words, axis=1), jnp.mean(imgs, axis=1)), axis=1)
        dim = self.text_dim + self.image_dim
        return MlpHead(dim, self.num_classes, norm="rms", dtype=self.dtype,
                       name="mlpHead")(fused)
