"""MEANT encoder blocks (linen).

Block skeleton shared by every variant (`meant/meant.py:35-120`):

    inter = proj_out(dropout?(norm2(attn(proj_in(norm1(x))))))
    x1    = inter + x                      # residual 1
    inter = ff_out(dropout2?(norm4(gelu(ff_in(norm3(x1))))))
    out   = inter + x1                     # residual 2

Generation differences (SURVEY.md §2.2, Appendix A):
  * top-level ("paper"): RMSNorm everywhere, torch-default init;
    languageEncoder has Dropout(dropout) before proj_out and a Dropout(p=0.5!)
    before ff_out (`meant/meant.py:105-107` — nn.Dropout() default);
    visionEncoder has no dropouts.
  * src-era: LayerNorm for norm1/2/3 but RMSNorm for norm4 in encode2
    (`src/meant/meant.py:63,121`), xavier-uniform init with zero bias.

Attention-mask dispatch quirk: the reference passes attention_mask only when
the submodule's class name is literally 'xPosAttention'
(`meant/meant.py:110-115`), so the flash path NEVER sees the padding mask.
Replicated via `mask_in_flash=False` default: with flash=True the mask is
dropped (documented defect; set mask_in_flash=True for the fixed behavior —
the Pallas kernel supports masking either way).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.nn.attention_modules import (RotaryAttention,
                                            TemporalAttention, XPosAttention)
from meant_tpu.nn.layers import Linear, gelu, make_norm


class LanguageEncoder(nn.Module):
    """languageEncoder (`meant/meant.py:78-120`; src `src/meant/meant.py:92-150`)."""
    dim: int
    num_heads: int
    dropout: float = 0.0
    ff_dropout: float = 0.5      # reference nn.Dropout() default in encode2
    norm: str = "rms"            # 'rms' (paper) | 'layer' (src)
    ff_norm2: Optional[str] = None  # src uses RMSNorm for encode2's 2nd norm
    init_style: str = "torch"
    flash: bool = False
    mask_in_flash: bool = False
    causal: bool = True
    rot_dim: Optional[int] = None  # xPos rotated width (48 default; MOSI 30)
    ring_mesh: Optional[object] = None  # sequence-parallel long-context mode
    ring_axis: str = "data"
    ring_flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True):
        d = self.dim
        ff_norm2 = self.ff_norm2 or self.norm
        inter = make_norm(self.norm, d, "norm1")(x)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="proj_in")(inter)
        mask = attention_mask
        if self.flash and not self.mask_in_flash:
            mask = None  # reference drops the mask on the flash path
        inter = XPosAttention(self.num_heads, d, causal=self.causal,
                              rot_dim=self.rot_dim,
                              init_style=self.init_style, flash=self.flash,
                              ring_mesh=self.ring_mesh,
                              ring_axis=self.ring_axis,
                              ring_flash=self.ring_flash,
                              dtype=self.dtype, name="attn")(inter, mask)
        inter = make_norm(self.norm, d, "norm2")(inter)
        inter = nn.Dropout(self.dropout, name="drop1")(
            inter, deterministic=deterministic)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="proj_out")(inter)
        x1 = inter + x

        inter = make_norm(self.norm, d, "norm3")(x1)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="ff_in")(inter)
        inter = gelu(inter)
        inter = make_norm(ff_norm2, d, "norm4")(inter)
        inter = nn.Dropout(self.ff_dropout, name="drop2")(
            inter, deterministic=deterministic)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="ff_out")(inter)
        return inter + x1


class VisionEncoder(nn.Module):
    """visionEncoder (`meant/meant.py:35-75`; src `src/meant/meant.py:35-89`).
    Same skeleton, pixel-rotary attention, no dropouts in the paper variant."""
    dim: int
    num_heads: int
    norm: str = "rms"
    ff_norm2: Optional[str] = None
    init_style: str = "torch"
    flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = self.dim
        ff_norm2 = self.ff_norm2 or self.norm
        inter = make_norm(self.norm, d, "norm1")(x)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="proj_in")(inter)
        inter = RotaryAttention(self.num_heads, d, init_style=self.init_style,
                                flash=self.flash, dtype=self.dtype,
                                name="attn")(inter)
        inter = make_norm(self.norm, d, "norm2")(inter)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="proj_out")(inter)
        x1 = inter + x

        inter = make_norm(self.norm, d, "norm3")(x1)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="ff_in")(inter)
        inter = gelu(inter)
        inter = make_norm(ff_norm2, d, "norm4")(inter)
        inter = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                       name="ff_out")(inter)
        return inter + x1


_TEMPORAL_STYLES = {
    # style: (norm_kind, use_temp_embedding, attn_variant, init_style)
    # paper (`meant/meant.py:124-145`): positional param + RMSNorm sandwich.
    "paper": ("rms", True, "paper", "torch"),
    # slim (`meant/meant_tweet.py:95-112`, `meant_vision.py:81-106`):
    # positional param + [Linear, temporal, Linear] (norms commented out).
    "slim": (None, True, "paper", "torch"),
    # src (`src/meant/meant.py:153-199`): no positional param, LayerNorms,
    # xavier init, src temporal (flat (b, dim) output).
    "src": ("layer", False, "src", "xavier"),
    # meant_price (`src/meant/meantPrice.py:16-64`): like src but the
    # LayerNorms are commented out — [Linear, temporal, Linear] only.
    "src_slim": (None, False, "src", "xavier"),
    # meantTweetPrice (`src/meant/meant_tweet_price.py:113-136`): positional
    # param + RMSNorm sandwich + Dropout before proj_out, src temporal.
    "tweet_price": ("rms", True, "src", "torch"),
}


class TemporalEncoder(nn.Module):
    """temporalEncoder around the antecedent-lag attention; per-generation
    wiring in _TEMPORAL_STYLES."""
    dim: int
    num_heads: int
    lag: int
    style: str = "paper"
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = self.dim
        norm_kind, use_embed, variant, init_style = \
            _TEMPORAL_STYLES[self.style]
        if use_embed:
            temp_embedding = self.param(
                "temp_embedding", nn.initializers.normal(1.0),
                (1, self.lag, d))
            x = x + temp_embedding
        if norm_kind:
            x = make_norm(norm_kind, d, "norm1")(x)
        x = Linear(d, d, init_style=init_style, dtype=self.dtype,
                   name="proj_in")(x)
        x = TemporalAttention(self.num_heads, d, variant=variant,
                              init_style=init_style, dtype=self.dtype,
                              name="temporal")(x)
        if norm_kind:
            x = make_norm(norm_kind, d, "norm2")(x)
        if self.dropout:
            x = nn.Dropout(self.dropout, name="drop")(
                x, deterministic=deterministic)
        x = Linear(d, d, init_style=init_style, dtype=self.dtype,
                   name="proj_out")(x)
        return x
