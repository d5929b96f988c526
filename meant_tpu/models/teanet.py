"""teanet — the external baseline the reference harnesses compare against.

The reference imports `teanet` from the sibling out-of-repo `michinaga`
package via sys.path (`in_loop_train.py:35-38`); its source is not part of
the biirving/meant snapshot. This is a re-implementation from the TEANet
design (Zhang et al., transformer-based attention network for stock movement
prediction) matching the harness call signature
(`in_loop_train.py:223,256`: `teanet(tweets, macds)` /
`teanet(tweets, prices)` with lag-windowed inputs):

  per-day text encoding (token embedding, mean-pooled) -> concat per-day
  price features -> transformer encoder over the lag axis -> target-day
  attention readout -> sigmoid classifier.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.nn.layers import Linear, gelu, make_norm
from meant_tpu.nn.attention_modules import TemporalAttention


class teanet(nn.Module):
    dim: int = 128
    num_heads: int = 4
    lag: int = 5
    num_classes: int = 2
    vocab_size: int = 64001
    price_dim: int = 4
    num_layers: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tweets, prices, deterministic: bool = True):
        b, lag = tweets.shape[0], tweets.shape[1]
        # tweets arrive as (possibly float-cast) token ids (b, lag, s)
        ids = tweets.astype(jnp.int32)
        emb = nn.Embed(self.vocab_size, self.dim,
                       embedding_init=nn.initializers.normal(0.02),
                       name="embedding")(ids)             # (b, lag, s, d)
        text = jnp.mean(emb, axis=2)                       # (b, lag, d)
        feats = jnp.concatenate(
            (text, prices.astype(text.dtype)), axis=-1)
        x = Linear(self.dim, self.dim + self.price_dim, dtype=self.dtype,
                   name="fuse")(feats)                     # (b, lag, d)
        for i in range(self.num_layers):
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"attn_{i}")(x, x)
            x = make_norm("layer", self.dim, f"norm1_{i}")(x + h)
            h = Linear(self.dim, self.dim, dtype=self.dtype,
                       name=f"ff_{i}")(gelu(
                           Linear(self.dim, self.dim, dtype=self.dtype,
                                  name=f"ff_in_{i}")(x)))
            x = make_norm("layer", self.dim, f"norm2_{i}")(x + h)
        out = TemporalAttention(self.num_heads, self.dim, variant="src",
                                dtype=self.dtype, name="temporal")(x)
        out = Linear(self.num_classes, self.dim, dtype=self.dtype,
                     name="head")(out)
        return jax.nn.sigmoid(out)
