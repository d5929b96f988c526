"""Attention modules of the MEANT family (linen).

Each module owns its q/k/v/output projections and its rotary frequency table
(stored as a non-trainable param, mirroring the reference's
`nn.Parameter(freqs, requires_grad=False)` in `rotary_embedding_torch.py:89`
— so a torch weight port carries the exact fp32 table and parity holds).

Projection-naming quirk: the reference maps ``(q(x), v(x), k(x))`` onto
``q_mat, k_mat, v_mat`` (`meant/xPosAttention.py:37-38`,
`meant/attention.py:37-38`, `meant/temporal.py:38-39`), i.e. its "v" Linear
produces keys and its "k" Linear produces values. Here q/k/v mean what they
say; the torch-weight importer swaps the two (see
meant_tpu/utils/port.py).

The `flash` flag swaps the XLA `attend` for the Pallas flash kernel — same
math, fused xPos/rotary in the kernel. It intentionally does NOT reproduce the
reference flash quirks (rotation applied over the heads axis because q/k were
laid out `b s h d`, `meant/xPosAttention_flash.py:35-41`; `1/dim` softmax
scale + forced fp16 in `meant/flash_attention.py:42` — defects §2.6.4).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu import ops
from meant_tpu.nn.layers import Linear


def _freqs_param(module: nn.Module, name: str, table: jnp.ndarray):
    # Non-trainable constant carried in params so checkpoints/ports preserve
    # the exact table. Gradient flow is irrelevant (stop_gradient on use).
    return module.param(name, lambda key: table)


class XPosAttention(nn.Module):
    """Language MHA with xPos rotary on the leading `2 * rot_half` features of
    each head (`meant/xPosAttention.py:11-67`). Causal by default (mask=True
    in the reference ctor), additive -1e9 padding mask.

    scale defaults to 1/sqrt(Dh * num_heads) == 1/sqrt(dim)
    (`meant/xPosAttention.py:41`).
    """
    num_heads: int
    dim: int
    # Reference hard-codes RotaryEmbedding(dim=48) => 48 rotated features per
    # head (`meant/meant.py:88`); clamped to the head dim for small models.
    rot_dim: Optional[int] = None
    causal: bool = True
    scale: Optional[float] = None
    xpos_scale_base: float = 512.0
    init_style: str = "torch"
    flash: bool = False
    # sequence-parallel ring attention: give the mesh whose `ring_axis`
    # shards the sequence; activations stay sequence-sharded end to end
    # and K/V rotate over the ICI ring (ops/ring.py). Long-context mode —
    # overrides `flash`.
    ring_mesh: Optional[object] = None
    ring_axis: str = "data"
    ring_flash: bool = False   # Pallas engine per ring chunk (long s_loc)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attention_mask=None):
        h, d = self.num_heads, self.dim
        dh = d // h
        rot_dim = min(self.rot_dim if self.rot_dim is not None else 48, dh)
        scale = self.scale if self.scale is not None else 1.0 / math.sqrt(d)
        freqs = _freqs_param(self, "freqs", ops.lang_freqs(rot_dim))
        freqs = jax.lax.stop_gradient(freqs)

        q = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                   name="q")(x)
        k = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                   name="k")(x)
        v = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                   name="v")(x)
        q, k, v = (ops.split_heads(t, h) for t in (q, k, v))
        if self.ring_mesh is not None:
            from meant_tpu.ops.ring import make_ring_attention
            # rotation uses GLOBAL positions (jit presents global shapes);
            # the shard_map inside splits the sequence axis per device
            q, k = ops.rotate_queries_and_keys(
                q, k, freqs, rot_dim=rot_dim,
                scale_base=self.xpos_scale_base)
            mask = attention_mask
            if mask is None:
                mask = jnp.ones((q.shape[0], k.shape[2]), jnp.float32)
            out = make_ring_attention(
                self.ring_mesh, scale=scale, causal=self.causal,
                axis=self.ring_axis,
                use_flash=self.ring_flash)(q, k, v.astype(q.dtype),
                                           mask.astype(jnp.float32))
        elif self.flash:
            from meant_tpu.ops.flash import flash_attention
            out = flash_attention(
                q, k, v, scale=scale, causal=self.causal,
                attention_mask=attention_mask, rope_freqs=freqs,
                xpos=True, xpos_scale_base=self.xpos_scale_base)
        else:
            q, k = ops.rotate_queries_and_keys(
                q, k, freqs, rot_dim=rot_dim,
                scale_base=self.xpos_scale_base)
            out = ops.attend(q, k, v, scale=scale, causal=self.causal,
                             attention_mask=attention_mask)
        out = ops.merge_heads(out)
        return Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                      name="multi_mad")(out)


class RotaryAttention(nn.Module):
    """Vision MHA with pixel-frequency rotary on q and k
    (`meant/attention.py:11-62`). No causal mask in effect (the reference's
    mask closure is a no-op — defect §2.6.2); no padding mask.
    """
    num_heads: int
    dim: int
    rot_dim: Optional[int] = None   # default floor(dim/heads/2)*2 rotated dims
    scale: Optional[float] = None
    init_style: str = "torch"
    flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h, d = self.num_heads, self.dim
        # Reference: RotaryEmbedding(dim=floor(dim/heads/2), freqs_for='pixel')
        # => rotated width = 2 * (floor(dim/heads/2) // 2) ... the table has
        # dim//2 freqs each duplicated => rot width 2*(rot_param//2)*... —
        # concretely: rot_param=48 => 24 freqs => 48 rotated features.
        rot_param = self.rot_dim if self.rot_dim is not None else (d // h) // 2
        scale = self.scale if self.scale is not None else 1.0 / math.sqrt(d)
        freqs = _freqs_param(self, "freqs", ops.pixel_freqs(rot_param))
        freqs = jax.lax.stop_gradient(freqs)

        q = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                   name="q")(x)
        k = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                   name="k")(x)
        v = Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                   name="v")(x)
        q, k, v = (ops.split_heads(t, h) for t in (q, k, v))
        if self.flash:
            from meant_tpu.ops.flash import flash_attention
            out = flash_attention(q, k, v, scale=scale, causal=False,
                                  rope_freqs=freqs, xpos=False)
        else:
            q = ops.rotate_queries_or_keys(q, freqs)
            k = ops.rotate_queries_or_keys(k, freqs)
            out = ops.attend(q, k, v, scale=scale, causal=False)
        out = ops.merge_heads(out)
        return Linear(d, d, init_style=self.init_style, dtype=self.dtype,
                      name="multi_mad")(out)


class TemporalAttention(nn.Module):
    """Antecedent-lag attention: the query is built ONLY from the target
    (last) lag step; keys/values span all lag steps (paper §3.5.1).

    variant='paper' (`meant/temporal.py:34-60`): scale 1/sqrt(Dh*h), output
    (b, 1, dim) -> multi_mad -> (b, 1, dim).
    variant='src' (`src/meant/temporal.py:38-74`): scale 1/sqrt(Dh), the
    optional xPos rotation is an exact identity (q_len == 1; see
    ops/rotary.rotate_queries_and_keys) so it is omitted, output flattened
    (b, dim) -> multi_mad -> (b, dim).
    """
    num_heads: int
    dim: int
    variant: str = "paper"
    init_style: str = "torch"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, lag, d = x.shape
        h = self.num_heads
        dh = d // h if d >= h else 1
        atten_size = dh * h
        if self.variant == "src":
            scale = 1.0 / math.sqrt(dh)
        else:
            scale = 1.0 / math.sqrt(dh * h)

        q = Linear(atten_size, d, init_style=self.init_style,
                   dtype=self.dtype, name="q")(x[:, -1, :])  # (b, hd)
        k = Linear(atten_size, d, init_style=self.init_style,
                   dtype=self.dtype, name="k")(x)
        v = Linear(atten_size, d, init_style=self.init_style,
                   dtype=self.dtype, name="v")(x)
        q = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)    # (b, h, 1, dh)
        k = k.reshape(b, lag, h, dh).transpose(0, 2, 1, 3)  # (b, h, lag, dh)
        v = v.reshape(b, lag, h, dh).transpose(0, 2, 1, 3)
        out = ops.lag_attend(q, k, v, scale=scale)          # (b, h, 1, dh)
        if self.variant == "src":
            out = out.transpose(0, 2, 1, 3).reshape(b, atten_size)
        else:
            out = out.transpose(0, 2, 1, 3).reshape(b, 1, atten_size)
        return Linear(d, atten_size, init_style=self.init_style,
                      dtype=self.dtype, name="multi_mad")(out)


class TemporalAttention2(nn.Module):
    """temporal_2 (`src/meant/temporal_new.py:7-69`): 4-D lag attention over
    (b, lag, s, d). Query from the LAST lag step only (all s positions),
    keys/values over every lag step (broadcast over l), scale 1/sqrt(Dh),
    numerically-stabilized softmax (the reference subtracts the row max —
    redundant with a proper softmax but shown for fidelity), output
    rearranged 'b l h s d -> b s (l h d)' with l == 1 and projected by
    multi_mad Linear(lag * h * Dh, dim) — NOTE the reference sizes multi_mad
    by `lag` though the attended l-axis is 1; weights beyond h*Dh are dead
    (documented quirk; here multi_mad takes the live h*Dh slice)."""
    num_heads: int
    dim: int
    lag: int = 5
    sequence_length: int = 128
    init_style: str = "xavier"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attention_mask=None):
        b, l, s, d = x.shape
        h = self.num_heads
        dh = max(d // h, 1)
        atten = dh * h
        q = Linear(atten, d, init_style=self.init_style, dtype=self.dtype,
                   name="q")(x[:, -1])                    # (b, s, atten)
        k = Linear(atten, d, init_style=self.init_style, dtype=self.dtype,
                   name="k")(x)                           # (b, l, s, atten)
        v = Linear(atten, d, init_style=self.init_style, dtype=self.dtype,
                   name="v")(x)
        q = q.reshape(b, 1, s, h, dh).transpose(0, 1, 3, 2, 4)   # b 1 h s d
        k = k.reshape(b, l, s, h, dh).transpose(0, 1, 3, 2, 4)   # b l h s d
        v = v.reshape(b, l, s, h, dh).transpose(0, 1, 3, 2, 4)
        scores = jnp.einsum("bihqd,blhkd->blhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / math.sqrt(dh)
        if attention_mask is not None:
            bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
            scores = scores + bias[:, :, None, None, :]
        weights = jax.nn.softmax(scores, axis=-1)
        inter = jnp.einsum("blhqk,blhkd->blhqd", weights,
                           v.astype(jnp.float32)).astype(x.dtype)
        # 'b l h s d -> b s (l h d)' with the attended l axis == l (broadcast
        # kept all lag rows); the reference keeps q's l==1... its q row
        # broadcasts over k's l, giving l output rows — flatten l*h*dh.
        inter = inter.transpose(0, 3, 1, 2, 4).reshape(b, s, l * h * dh)
        out = Linear(d, self.lag * atten, init_style=self.init_style,
                     dtype=self.dtype, name="multi_mad")(inter)
        return out
