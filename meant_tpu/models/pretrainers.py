"""Pretraining wrappers (working copies live at `pretrain_mlm.py:74-88` and
`pretrain_mim.py:77-99` in the reference; the `meant/hf_wrapper.py:111-149`
duplicates are broken — SURVEY.md §2.6.7).

meant_language_pretrainer: embeddings -> N languageEncoders -> RoBERTa-style
LM head (dense -> gelu -> LayerNorm -> vocab decoder) for MLM with CE over
the vocabulary (`pretrain_mlm.py:182`).

meant_vision_pretrainer: patchEmbed -> visionEncoders -> reshape tokens to a
(b, dim, √n, √n) feature map -> ViT-MIM-style decoder (1x1 conv to
patch²*3 + pixel shuffle) reconstructing RGB; L1 loss on the first 3 channels
(`pretrain_mim.py:162,204`).

NOTE DEFECTS #29: the torch meant_vision_pretrainer builds exactly ONE
visionEncoder no matter what num_encoders says (`pretrain_mim.py:86` —
`nn.ModuleList([visionEncoder(...)])` ignores the arg, while checkpoints
are NAMED with num_encoders). Here num_encoders is honored — the MLM twin
(`pretrain_mlm.py:78`) defines the intent — and assembled-pretrainer parity
is pinned at depth 1, the only depth the reference can actually produce
(tests/test_reference_parity.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu import ops
from meant_tpu.models.meant import (EmbeddingConfig, _embedding,
                                    _lang_tower, _vision_tower)
from meant_tpu.nn.layers import Linear, gelu, make_norm


class RobertaLMHead(nn.Module):
    """dense -> gelu -> LayerNorm -> decoder(vocab) (HF RobertaLMHead).

    `shared_kernel`: pass the (vocab, hidden) word-embedding table to TIE
    the decoder to it (HF `tie_word_embeddings`, the RobertaForMaskedLM
    default the reference pretrainer assembles from — `pretrain_mlm.py:
    317-320`); only a decoder_bias param is created. None = untied
    standalone decoder Linear."""
    hidden_size: int
    vocab_size: int
    layer_norm_eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, shared_kernel=None):
        x = Linear(self.hidden_size, self.hidden_size, dtype=self.dtype,
                   name="dense")(x)
        x = gelu(x)
        x = make_norm("layer", self.hidden_size, "norm")(x)
        if shared_kernel is not None:
            bias = self.param("decoder_bias", nn.initializers.zeros,
                              (self.vocab_size,))
            k = shared_kernel
            if self.dtype is not None:
                x = x.astype(self.dtype)
                k = k.astype(self.dtype)
            # contract hidden directly against the (vocab, hidden) table —
            # `x @ k.T` materializes a transposed copy of the 98 MB tied
            # table every step (measured 6.25 ms/step in the b64 MLM trace)
            out = jax.lax.dot_general(
                x, k, (((x.ndim - 1,), (1,)), ((), ())))
            return out + bias.astype(out.dtype)
        return Linear(self.vocab_size, self.hidden_size, dtype=self.dtype,
                      name="decoder")(x)


class meant_language_pretrainer(nn.Module):
    """`pretrain_mlm.py:74-88`. forward(words (b, s), attention_mask) ->
    (b, s, vocab) logits."""
    num_encoders: int
    embedding: EmbeddingConfig = EmbeddingConfig()
    flash: bool = False
    lag: int = 5
    text_dim: int = 768
    num_heads: int = 8
    # reference languageEncoder.encode2 uses nn.Dropout() == p=0.5
    # (`meant/meant.py:107`, DEFECTS #22); 0.0 disables it (fixed mode)
    ff_dropout: float = 0.5
    # compile-time lever: one lax.scan over layer-stacked encoders
    # (nn/stack.py); remat: False | True/'full' | 'dots'
    scan_layers: bool = False
    remat: Any = False
    # HF ties lm_head.decoder.weight to the word-embedding table and the
    # reference assembles its pretrainer from RobertaForMaskedLM, so its
    # MLM training runs TIED (one shared tensor, summed gradient, one Adam
    # slot) — trajectory parity requires replicating that. False = untied
    # standalone decoder.
    tie_word_embeddings: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, words, attention_mask=None,
                 deterministic: bool = True, positions=None):
        """`positions` (b, k) int32 token indices: compute the LM head at
        those positions only, returning (b, k, vocab). MLM's CE ignores
        every non-masked position (-100 labels zero the logit cotangent
        exactly), so gathering the ~15% masked positions before the
        vocab-64001 projection is EXACT math — same loss, same gradients —
        while cutting the head+CE block (measured 33 of 69 ms/step at b64)
        by the capacity ratio. None = full (b, s, vocab) logits."""
        emb = _embedding(self.embedding, self.dtype)
        x = emb(words, deterministic=deterministic)
        x = _lang_tower(x, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, flash=self.flash,
            ff_dropout=self.ff_dropout, dtype=self.dtype),
            attention_mask, deterministic)
        if positions is not None:
            x = jnp.take_along_axis(x, positions[:, :, None], axis=1)
        shared = emb.word_embeddings if self.tie_word_embeddings else None
        return RobertaLMHead(self.text_dim, self.embedding.vocab_size,
                             name="mlm_head")(x, shared_kernel=shared)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(b, C*r², h, w) -> (b, C, h*r, w*r), torch PixelShuffle semantics."""
    b, crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(b, c, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b c h r w r
    return x.reshape(b, c, h * r, w * r)


class meant_vision_pretrainer(nn.Module):
    """`pretrain_mim.py:77-99` with the ViT-MIM decoder the harness passes in
    (`pretrain_mim.py:339`): 1x1 conv hidden -> patch²*3, PixelShuffle.
    forward(images (b, c, H, W)) -> (b, 3, H, W) reconstruction."""
    num_encoders: int
    patch_res: int = 16
    channels: int = 4
    height: int = 224
    width: int = 224
    image_dim: int = 768
    num_heads: int = 8
    flash: bool = False
    # compile-time lever: one lax.scan over layer-stacked encoders
    # (nn/stack.py); remat: False | True/'full' | 'dots'
    scan_layers: bool = False
    remat: Any = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        x = ops.patchify(images, self.patch_res)
        patch_dim = self.channels * self.patch_res ** 2
        x = Linear(self.image_dim, patch_dim, dtype=self.dtype,
                   name="patchEmbed")(x)
        x = _vision_tower(x, self, dict(
            dim=self.image_dim, num_heads=self.num_heads, flash=self.flash,
            dtype=self.dtype), deterministic)
        b, n, d = x.shape
        hw = math.floor(n ** 0.5)
        fmap = x.transpose(0, 2, 1).reshape(b, d, hw, hw)
        # decoder: 1x1 conv == per-position Linear d -> r²*3
        r = self.patch_res
        dec = Linear(r * r * 3, d, dtype=self.dtype, name="decoder")(
            fmap.transpose(0, 2, 3, 1))           # (b, hw, hw, r²*3)
        dec = dec.transpose(0, 3, 1, 2)            # (b, r²*3, hw, hw)
        return pixel_shuffle(dec, r)
