"""meant_v2 — repaired implementation of the reference's broken experimental
variant (`meant/meant_v2.py:54-231`: wrong `super(languageEncoder, ...)` on
an undefined name, forward reads undefined `embeddings/_batch` — SURVEY.md
§2.6.6; it never ran as shipped).

The INTENT, reconstructed from the file: fold the token embedding into the
first language encoder (languageEncoder_v2 = embedding + encoder in one
block) so the pretrained-embedding graft and encoder stack travel together;
the rest of the model matches `meant`. Implemented accordingly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from meant_tpu import ops
from meant_tpu.models.meant import EmbeddingConfig, MlpHead, _embedding
from meant_tpu.nn.encoders import (LanguageEncoder, TemporalEncoder,
                                   VisionEncoder)
from meant_tpu.nn.layers import Linear


class LanguageEncoderV2(nn.Module):
    """First language block with the embedding folded in."""
    dim: int
    num_heads: int
    embedding: EmbeddingConfig
    flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 deterministic: bool = True):
        x = _embedding(self.embedding, self.dtype)(
            input_ids, deterministic=deterministic)
        return LanguageEncoder(self.dim, self.num_heads, flash=self.flash,
                               dtype=self.dtype, name="encoder")(
            x, attention_mask, deterministic=deterministic)


class meant_v2(nn.Module):
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
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, images, attention_mask=None,
                 deterministic: bool = True):
        b = images.shape[0]
        lag, s = tweets.shape[1], tweets.shape[2]
        words_ids = tweets.reshape(b * lag, s)
        am = (attention_mask.reshape(b * lag, s)
              if attention_mask is not None else None)
        words = LanguageEncoderV2(self.text_dim, self.num_heads,
                                  self.embedding, flash=self.flash,
                                  dtype=self.dtype,
                                  name="languageEncoders_0")(
            words_ids, am, deterministic=deterministic)
        for i in range(1, self.num_encoders):
            words = LanguageEncoder(self.text_dim, self.num_heads,
                                    flash=self.flash, dtype=self.dtype,
                                    name=f"languageEncoders_{i}")(
                words, am, deterministic=deterministic)
        words = words.reshape(b, lag, s, self.text_dim)

        imgs = images.reshape(b * lag, *images.shape[2:])
        imgs = ops.patchify(imgs, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        imgs = Linear(self.image_dim, patch_dim, dtype=self.dtype,
                      name="patchEmbed")(imgs)
        for i in range(self.num_encoders):
            imgs = VisionEncoder(self.image_dim, self.num_heads,
                                 flash=self.flash, dtype=self.dtype,
                                 name=f"visionEncoders_{i}")(
                imgs, deterministic=deterministic)
        imgs = imgs.reshape(b, lag, imgs.shape[1], self.image_dim)

        fused = jnp.concatenate(
            (jnp.mean(words, axis=2), jnp.mean(imgs, axis=2)), axis=2)
        dim = self.text_dim + self.image_dim
        fused = TemporalEncoder(dim, self.num_heads, self.lag, style="paper",
                                dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        out = MlpHead(dim, self.num_classes, norm="rms", dtype=self.dtype,
                      name="mlpHead")(fused)
        return out.squeeze(axis=1)
