"""TimeSformer-family MEANT variants
(`src/meant/meant_timesformer.py:202-358`, `src/meant/meant_mean_pooling.py:
200-326`, `src/meant/meant_mosi.py:~200-350`).

Pooling quirks replicated faithfully (flags give the fixed behavior):
  * lang_prep (`meant_timesformer.py:274-279,336-339`) is attention-weighted
    pooling: Linear(d,d)->LN->GELU->Linear(d,1)->softmax over the TOKEN axis.
  * image_prep (`:345`) applies the same stack to (b, 981, d) tokens, but the
    softmax runs over the SINGLETON projection axis => all-ones weights =>
    the image pooling is an unnormalized SUM over tokens. Replicated.
  * meant_mean_pooling's image_proj is the degenerate Linear(981,1)->
    LayerNorm(1)->GELU constant (same defect as meant_src's fusion;
    fixed_proj=True repairs it).
  * meant_mosi's fusion as shipped is shape-broken
    (`meant_mosi.py:352-355` concatenates (b,768) with (b,20,768)); the
    intended semantics — mean over the last frame's 20 tokens — is
    implemented. Its audio transformer branch is built and run but its
    output is DISCARDED by the reference fusion; replicated (compute kept
    for checkpoint/capability parity, `use_audio_in_fusion=True` wires it in).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.models.meant import (EmbeddingConfig, MlpHead, _embedding,
                                    _lang_tower)
from meant_tpu.models.meant_src import SeqProjection
from meant_tpu.nn.encoders import TemporalEncoder
from meant_tpu.nn.layers import Linear, gelu, make_norm
from meant_tpu.nn.timesformer import TimeSformer


class AttnPool(nn.Module):
    """lang_prep/image_prep: Linear(d,d)->LN(d)->GELU->Linear(d,1)->softmax
    over `softmax_axis`. Input (..., tokens, d); returns weights
    (..., tokens, 1)."""
    dim: int
    softmax_axis: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        w = Linear(self.dim, self.dim, dtype=self.dtype, name="proj1")(x)
        w = make_norm("layer", self.dim, "norm")(w)
        w = gelu(w)
        w = Linear(1, self.dim, dtype=self.dtype, name="proj2")(w)
        return jax.nn.softmax(w, axis=self.softmax_axis)


class _TimesformerBase(nn.Module):
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
    # compile-time lever: lax.scan over layer-stacked params for BOTH depth
    # axes (languageEncoders via nn/stack.scanned_stack; the TimeSformer's
    # layers via TimeSformer(scan_layers=True)); remat: False | 'full' |
    # 'dots' (nn/stack.py)
    scan_layers: bool = False
    remat: Any = False
    dtype: Optional[jnp.dtype] = None

    def _encode_text(self, input_ids, attention_mask, deterministic):
        b, lag, s = input_ids.shape
        words = input_ids.reshape(b * lag, s)
        words = _embedding(self.embedding, self.dtype)(
            words, deterministic=deterministic)
        if attention_mask is not None:
            attention_mask = attention_mask.reshape(b * lag, s)
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, norm="layer",
            ff_norm2="rms", init_style="xavier", flash=self.flash,
            dtype=self.dtype), attention_mask, deterministic)
        return words.reshape(b, lag, s, self.text_dim)

    def _timesformer(self):
        return TimeSformer(
            dim=self.image_dim, image_size=self.height,
            patch_size=self.patch_res, num_frames=self.lag,
            num_classes=self.num_classes, depth=1, heads=8, dim_head=64,
            attn_dropout=0.1, ff_dropout=0.1, channels=self.channels,
            flash=self.flash, scan_layers=self.scan_layers,
            remat=self.remat, dtype=self.dtype, name="timesformer")


class meant_timesformer(_TimesformerBase):
    """forward(**batch): attention-weighted text pooling + TimeSformer image
    branch (token-sum pooling), temporal on text+price, image concat after —
    head dim 1541 (`meant_timesformer.py:287-288,292-358`)."""

    @nn.compact
    def __call__(self, input_ids=None, pixels=None, prices=None,
                 attention_mask=None, labels=None, pixel_mask=None,
                 deterministic: bool = True, **_):
        b = pixels.shape[0]
        words = self._encode_text(input_ids, attention_mask, deterministic)
        s = words.shape[2]
        if s < self.seq_len:
            words = jnp.pad(words, ((0, 0), (0, 0),
                                    (0, self.seq_len - s), (0, 0)))

        img_tokens = self._timesformer()(pixels, deterministic=deterministic,
                                         return_tokens=True)  # (b, 981, d)

        # attention-weighted token pooling over the (padded) seq axis
        w_weights = AttnPool(self.text_dim, softmax_axis=2, dtype=self.dtype,
                             name="lang_prep")(words)        # (b, l, S, 1)
        words = jnp.einsum("blsd,bls->bld", words,
                           w_weights.squeeze(-1))

        # image "softmax" over the singleton axis == all-ones => token SUM
        i_weights = AttnPool(self.image_dim, softmax_axis=2,
                             dtype=self.dtype, name="image_prep")(img_tokens)
        images = jnp.einsum("bpd,bp->bd", img_tokens, i_weights.squeeze(-1))

        dim = self.text_dim + self.price_dim
        fused = jnp.concatenate((words, prices.astype(words.dtype)), axis=2)
        if self.dtype is not None:
            fused = fused.astype(self.dtype)
        fused = TemporalEncoder(dim, self.num_heads, self.lag, style="src",
                                dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        fused = jnp.concatenate((fused, images.astype(fused.dtype)), axis=1)
        other_dim = dim + self.image_dim  # 1541
        return MlpHead(other_dim, self.num_classes, norm="layer",
                       dtype=self.dtype, name="mlpHead")(fused)


class meant_mean_pooling(_TimesformerBase):
    """forward(**batch): mean-pooled text, TimeSformer image branch through
    the degenerate image_proj; head dim 1541
    (`meant_mean_pooling.py:286-326`)."""

    @nn.compact
    def __call__(self, input_ids=None, pixels=None, prices=None,
                 attention_mask=None, labels=None, deterministic: bool = True,
                 **_):
        words = self._encode_text(input_ids, attention_mask, deterministic)
        words = jnp.mean(words, axis=2)                       # (b, l, d)
        img_tokens = self._timesformer()(pixels, deterministic=deterministic,
                                         return_tokens=True)  # (b, p, d)
        n_tokens = img_tokens.shape[1]
        images = SeqProjection(n_tokens, fixed=self.fixed_proj,
                               dtype=self.dtype, name="image_proj")(
            img_tokens.transpose(0, 2, 1))                    # (b, d)

        dim = self.text_dim + self.price_dim
        fused = jnp.concatenate((words, prices.astype(words.dtype)), axis=2)
        if self.dtype is not None:
            fused = fused.astype(self.dtype)
        fused = TemporalEncoder(dim, self.num_heads, self.lag, style="src",
                                dtype=self.dtype,
                                name="temporal_encoding_0")(fused)
        fused = jnp.concatenate((fused, images.astype(fused.dtype)), axis=1)
        other_dim = dim + self.image_dim
        return MlpHead(other_dim, self.num_classes, norm="layer",
                       dtype=self.dtype, name="mlpHead")(fused)


def _permute1d_pe(seq_plus_cls: int, d_model: int) -> jnp.ndarray:
    """The reference's positional encoding, quirks included
    (`meant_mosi.py:324-327`): `Summer(PositionalEncodingPermute1D(s+1))`
    on a (b, s+1, d) CHANNELS-LAST tensor. PositionalEncodingPermute1D
    expects (b, ch, x) — so the library runs its sin||cos table over the
    d_model FEATURE axis as "positions" with s+1 "channels", i.e. the PE
    lands transposed. pe[p, c] with p in [0, s+1), c in [0, d_model):
    table[c, p] where table = [sin(pos*invfreq) || cos(pos*invfreq)] over
    ch = round_up(s+1, 2) channels, truncated to s+1."""
    ch = -(-(seq_plus_cls) // 2) * 2
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, ch, 2, dtype=jnp.float32)
                                / ch))
    pos = jnp.arange(d_model, dtype=jnp.float32)
    ang = pos[:, None] * inv_freq[None, :]            # (d_model, ch/2)
    # get_emb: stack(sin, cos) last-dim then flatten => INTERLEAVED pairs
    # (positional_encodings >= 5.x semantics)
    table = jnp.stack((jnp.sin(ang), jnp.cos(ang)),
                      axis=-1).reshape(d_model, ch)
    return table[:, :seq_plus_cls].T                   # (s+1, d_model)


class AudioEncoder(nn.Module):
    """MOSI audio branch (`meant_mosi.py:294-307,324-328`): learned cls
    embedding prepended, the transposed Permute1D positional encoding (see
    _permute1d_pe), 3-layer post-norm transformer encoder (d=130, 2 heads,
    ff 512, relu).

    DOCUMENTED REFERENCE QUIRK (default-on): the reference passes the
    collator's 1=valid mask as torch `src_key_padding_mask`, whose
    convention is True=PAD — so the reference attends exactly the PADDING
    positions (plus the always-kept cls). `torch_mask_quirk=False` uses the
    sane 1=attend convention."""
    d_model: int = 130
    nhead: int = 2
    num_layers: int = 3
    dim_feedforward: int = 512
    torch_mask_quirk: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, audio, audio_mask=None, deterministic: bool = True):
        b, s, d = audio.shape
        cls = self.param("cls_emb", nn.initializers.normal(1.0),
                         (1, 1, self.d_model))
        x = jnp.concatenate(
            (jnp.broadcast_to(cls, (b, 1, self.d_model)).astype(audio.dtype),
             audio), axis=1)
        if audio_mask is not None:
            if self.torch_mask_quirk:
                audio_mask = 1.0 - audio_mask.astype(jnp.float32)
            audio_mask = jnp.concatenate(
                (jnp.ones((b, 1), jnp.float32),
                 audio_mask.astype(jnp.float32)), axis=1)
        x = x + _permute1d_pe(s + 1, self.d_model).astype(x.dtype)
        for i in range(self.num_layers):
            # torch TransformerEncoderLayer (post-norm, relu)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype,
                name=f"attn_{i}")(x, x, mask=(
                    audio_mask[:, None, None, :] > 0
                    if audio_mask is not None else None))
            x = nn.LayerNorm(name=f"norm1_{i}")(x + h)
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name=f"ff1_{i}")(x)
            h = jax.nn.relu(h)
            h = nn.Dense(self.d_model, dtype=self.dtype, name=f"ff2_{i}")(h)
            x = nn.LayerNorm(name=f"norm2_{i}")(x + h)
        return x


class meant_mosi(nn.Module):
    """CMU-MOSI sentiment (`src/meant/meant_mosi.py`): text (pre-embedded
    features or token ids) through languageEncoders with max-pool fusion;
    20-feature video frames through a patch-1 TimeSformer; audio transformer
    (output discarded by the reference fusion — see module docstring)."""
    text_dim: int = 768
    image_dim: int = 768
    lag: int = 50
    num_classes: int = 2
    embedding: Optional[EmbeddingConfig] = None
    flash: bool = False
    num_heads: int = 8
    num_encoders: int = 1
    seq_len: int = 50
    use_audio_in_fusion: bool = False
    # compile-time lever, both depth axes (see _TimesformerBase)
    scan_layers: bool = False
    remat: Any = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids=None, pixels=None, audio=None,
                 audio_mask=None, attention_mask=None, labels=None,
                 deterministic: bool = True, **_):
        words = input_ids
        if self.embedding is not None:
            words = _embedding(self.embedding, self.dtype)(
                words, deterministic=deterministic)
        # MOSI's languageEncoder builds RotaryEmbedding(dim=30) — not
        # the usual 48 (`src/meant/meant_mosi.py:109-113`)
        words = _lang_tower(words, self, dict(
            dim=self.text_dim, num_heads=self.num_heads, norm="layer",
            ff_norm2="rms", init_style="xavier", flash=self.flash,
            rot_dim=30, dtype=self.dtype), attention_mask, deterministic)

        audio_repr = None
        if audio is not None:
            audio_repr = AudioEncoder(dtype=self.dtype, name="audio_encoder")(
                audio, audio_mask, deterministic=deterministic)

        # video: (b, f, 20) features -> (b, f, 1, 1, 20) "images"
        video = pixels[:, :, None, None, :]
        img_tokens = TimeSformer(
            dim=self.image_dim, image_size=20, patch_size=1,
            num_frames=self.lag, num_classes=self.num_classes,
            depth=self.num_encoders, heads=8, dim_head=64, attn_dropout=0.1,
            ff_dropout=0.1, channels=1, flash=self.flash,
            scan_layers=self.scan_layers, remat=self.remat, dtype=self.dtype,
            name="timesformer")(video, deterministic=deterministic,
                                return_tokens=True)
        img_tokens = img_tokens[:, 1:]                   # drop cls
        f = self.lag
        n = img_tokens.shape[1] // f
        img_tokens = img_tokens.reshape(-1, f, n, self.image_dim)
        # intended fusion: last frame's tokens, mean-pooled (the shipped
        # reference concatenation is shape-invalid — module docstring)
        images = jnp.mean(img_tokens[:, -1], axis=1)     # (b, d)

        text = jnp.max(words, axis=1)                    # (b, d) max-pool
        parts = [text, images.astype(text.dtype)]
        other_dim = self.text_dim + self.image_dim       # 1536
        if self.use_audio_in_fusion and audio_repr is not None:
            parts.append(audio_repr[:, 0].astype(text.dtype))
            other_dim += audio_repr.shape[-1]
        fused = jnp.concatenate(parts, axis=1)
        return MlpHead(other_dim, self.num_classes, norm="layer",
                       dtype=self.dtype, name="mlpHead")(fused)
