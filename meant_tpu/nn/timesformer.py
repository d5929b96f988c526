"""TimeSformer — divided space-time attention (linen).

Rebuild of the working divided space-time attention the reference adapted
from Phil Wang (`src/meant/timesformer_pytorch.py:1-265`; the hand-rolled
`meant/dividedSpaceTimeAttention.py` draft does not compile — SURVEY.md
§2.6.5). Semantics:

  * per layer: time attention ('b (f n) d' -> '(b n) f d'), then space
    attention ('b (f n) d' -> '(b f) n d'), then GEGLU FF — each PreNorm'd
    with residuals (`timesformer_pytorch.py:251-254`);
  * the cls token (index 0) attends globally over ALL tokens, and its
    key/value is broadcast into every time/space group
    (`timesformer_pytorch.py:116-133`);
  * q is pre-scaled by dim_head**-0.5 (`timesformer_pytorch.py:100,112`);
  * 1-D rotary on the time axis, 2-D axial rotary on the space axis — both
    in the (sin, cos) block layout of `src/utils/rotary.py`;
  * optional token shift (`PreTokenShift`, `timesformer_pytorch.py:34-55`).

TPU layout: the einops regroupings are pure reshape/transposes that XLA
fuses into the surrounding matmuls; attention runs per group with lag folded
into the batch axis, so the MXU sees large batched matmuls.

Kernel dispatch note: the divided attentions run tiny per-group sequences
(time: f=lag=5; space: n=196 patches at dim_head 64) — measured on v5e, the
Pallas flash kernel only beats XLA's fused attention from s≈256 upward
(README throughput matrix), so these stay on the XLA path by design; the
blockwise kernel in ops/flash is available for long-video configurations.

Video masking (uneven frame counts) is not used by any MEANT call site
(`meant_forward(images)` is always called mask-less) and is not implemented.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.ops import (apply_rot_emb_sincos, axial_rotary_sincos,
                           frame_rotary_sincos)
from meant_tpu.nn.layers import gelu


def _attn(q, k, v):
    """softmax(q @ k^T) @ v, q pre-scaled. (..., n, d) fp32-accumulated."""
    sim = jnp.einsum("...id,...jd->...ij", q, k,
                     preferred_element_type=jnp.float32)
    w = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("...ij,...jd->...id", w, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class TSAttention(nn.Module):
    """One divided-attention op (time or space grouping decided by caller).

    flash=True routes the grouped attention through the Pallas flash kernel
    (rotation already applied outside; cls k/v rides as the first key) —
    only engaged when the group is long enough to beat XLA (>= 256 incl.
    cls), i.e. long-video/high-res configurations; MEANT's f=5/n=196 groups
    stay on XLA either way (see module docstring)."""
    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    flash: bool = False
    flash_min_seq: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, group_size: int, num_groups: int, rot_sincos=None,
                 group_axis_first: bool = False, deterministic: bool = True):
        """x: (b, 1 + f*n, dim). Groups the non-cls tokens into
        (num_groups, group_size): time attention passes group_size=f,
        num_groups=n, group_axis_first=False (tokens are laid out f-major, so
        grouping by n requires a transpose); space attention passes
        group_size=n, num_groups=f, group_axis_first=True."""
        b, N, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        qkv = qkv.reshape(b, N, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (b, h, N, dh)
        q = q * (dh ** -0.5)
        bh = b * h
        q = q.reshape(bh, N, dh)
        k = k.reshape(bh, N, dh)
        v = v.reshape(bh, N, dh)

        cls_q, q_ = q[:, :1], q[:, 1:]
        cls_k, k_ = k[:, :1], k[:, 1:]
        cls_v, v_ = v[:, :1], v[:, 1:]

        # cls attends over everything
        cls_out = _attn(cls_q, k, v)               # (bh, 1, dh)

        f_or_n, g = num_groups, group_size
        # tokens are (f n) laid out f-major.
        def group(t):
            if group_axis_first:   # space: (bh, f, n, dh) -> (bh*f, n, dh)
                return t.reshape(bh, f_or_n, g, dh).reshape(bh * f_or_n, g,
                                                            dh)
            # time: (bh, f, n, dh) -> (bh, n, f, dh) -> (bh*n, f, dh)
            return t.reshape(bh, g, f_or_n, dh).transpose(0, 2, 1, 3) \
                .reshape(bh * f_or_n, g, dh)

        q_, k_, v_ = group(q_), group(k_), group(v_)
        if rot_sincos is not None:
            sin, cos = rot_sincos
            q_, k_ = apply_rot_emb_sincos(q_, k_, sin, cos)
            q_ = q_.astype(v_.dtype)
            k_ = k_.astype(v_.dtype)

        # expand cls k/v into each group
        r = num_groups
        def expand_cls(t):
            return jnp.broadcast_to(t[:, None], (bh, r, 1, dh)) \
                .reshape(bh * r, 1, dh)

        k_ = jnp.concatenate((expand_cls(cls_k), k_), axis=1)
        v_ = jnp.concatenate((expand_cls(cls_v), v_), axis=1)
        if self.flash and k_.shape[1] >= self.flash_min_seq:
            from meant_tpu.ops.flash import flash_mha
            out = flash_mha(q_[:, None], k_[:, None], v_[:, None],
                            scale=1.0)[:, 0]       # q pre-scaled
        else:
            out = _attn(q_, k_, v_)                # (bh*groups, g, dh)

        def ungroup(t):
            if group_axis_first:
                return t.reshape(bh, f_or_n, g, dh).reshape(bh, f_or_n * g,
                                                            dh)
            return t.reshape(bh, f_or_n, g, dh).transpose(0, 2, 1, 3) \
                .reshape(bh, g * f_or_n, dh)

        out = jnp.concatenate((cls_out, ungroup(out)), axis=1)  # (bh, N, dh)
        out = out.reshape(b, h, N, dh).transpose(0, 2, 1, 3).reshape(
            b, N, inner)
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, name="drop")(
            out, deterministic=deterministic)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype,
                     name="proj_in")(x)
        x, gates = jnp.split(x, 2, axis=-1)
        x = x * gelu(gates)
        x = nn.Dropout(self.dropout, name="drop")(
            x, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(x)


def token_shift(x, f: int):
    """PreTokenShift (`timesformer_pytorch.py:34-55`): split features into
    thirds; shift the first third back one frame, third third forward."""
    cls_x, tok = x[:, :1], x[:, 1:]
    b, fn, d = tok.shape
    n = fn // f
    tok = tok.reshape(b, f, n, d)
    chunk = d // 3
    c1, c2, c3 = tok[..., :chunk], tok[..., chunk:2 * chunk], \
        tok[..., 2 * chunk:3 * chunk]
    rest = tok[..., 3 * chunk:]
    # shift(t, -1): drop first frame, pad at end; shift(t, 1): pad at start
    c1 = jnp.concatenate(
        (c1[:, 1:], jnp.zeros_like(c1[:, :1])), axis=1)
    c3 = jnp.concatenate(
        (jnp.zeros_like(c3[:, :1]), c3[:, :-1]), axis=1)
    tok = jnp.concatenate((c1, c2, c3, rest), axis=-1).reshape(b, fn, d)
    return jnp.concatenate((cls_x, tok), axis=1)


class TSBlock(nn.Module):
    """One TimeSformer layer (time attn -> space attn -> GEGLU FF, each
    pre-LN'd with residual) as a standalone module: the lax.scan body for
    `TimeSformer(scan_layers=True)` (nn/stack.py). Child names mirror the
    unrolled layout minus the `_i` suffix, so
    stack/unstack_timesformer_params convert checkpoints both ways."""
    dim: int
    dim_head: int
    heads: int
    f: int            # frames (time group size)
    n: int            # patches per frame (space group size)
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    shift_tokens: bool = False
    flash: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, frame_rot, image_rot, deterministic: bool = True):
        y = x
        if self.shift_tokens:
            y = token_shift(y, self.f)
        y = nn.LayerNorm(name="time_norm")(y)
        x = TSAttention(self.dim, self.dim_head, self.heads,
                        self.attn_dropout, flash=self.flash,
                        dtype=self.dtype, name="time_attn")(
            y, group_size=self.f, num_groups=self.n, rot_sincos=frame_rot,
            group_axis_first=False, deterministic=deterministic) + x
        y = x
        if self.shift_tokens:
            y = token_shift(y, self.f)
        y = nn.LayerNorm(name="space_norm")(y)
        x = TSAttention(self.dim, self.dim_head, self.heads,
                        self.attn_dropout, flash=self.flash,
                        dtype=self.dtype, name="space_attn")(
            y, group_size=self.n, num_groups=self.f, rot_sincos=image_rot,
            group_axis_first=True, deterministic=deterministic) + x
        y = x
        if self.shift_tokens:
            y = token_shift(y, self.f)
        y = nn.LayerNorm(name="ff_norm")(y)
        return GEGLUFeedForward(self.dim, dropout=self.ff_dropout,
                                dtype=self.dtype, name="ff")(
            y, deterministic=deterministic) + x


class TimeSformer(nn.Module):
    """`src/meant/timesformer_pytorch.py:150-265`.

    scan_layers=True rolls the depth axis into ONE lax.scan over
    layer-stacked TSBlock params (`layers_scan`) — O(1)-in-depth program
    size and compile time, same contract as the meant towers (nn/stack.py);
    the scanned body always remats (default 'dots'). Requires rotary_emb
    (the learned pos_emb path is depth-independent anyway)."""
    dim: int
    num_frames: int
    num_classes: int
    image_size: int = 224
    patch_size: int = 16
    channels: int = 3
    depth: int = 12
    heads: int = 8
    dim_head: int = 64
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    rotary_emb: bool = True
    shift_tokens: bool = False
    flash: bool = False   # Pallas kernel for long time/space groups
    scan_layers: bool = False
    remat: Optional[object] = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, video, deterministic: bool = True,
                 return_tokens: bool = False):
        """video: (b, f, c, H, W). return_tokens=True is the reference's
        `meant_forward` (`timesformer_pytorch.py:208-259`): the full token
        sequence (b, 1 + f*n, dim); otherwise classification logits from the
        cls token."""
        b, f, c, H, W = video.shape
        p = self.patch_size
        hp, wp = H // p, W // p
        n = hp * wp
        # 'b f c (h p1) (w p2) -> b (f h w) (p1 p2 c)'
        x = video.reshape(b, f, c, hp, p, wp, p)
        x = x.transpose(0, 1, 3, 5, 4, 6, 2).reshape(b, f * n, p * p * c)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     name="to_patch_embedding")(x)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, self.dim))
        x = jnp.concatenate(
            (jnp.broadcast_to(cls[None], (b, 1, self.dim)).astype(x.dtype),
             x), axis=1)

        frame_rot = image_rot = None
        if self.rotary_emb:
            frame_rot = frame_rotary_sincos(self.dim_head, f)
            image_rot = axial_rotary_sincos(self.dim_head, hp, wp)
        else:
            pos = self.param("pos_emb", nn.initializers.normal(0.02),
                             (1 + self.num_frames * n, self.dim))
            x = x + pos[: x.shape[1]]

        if self.scan_layers:
            assert self.rotary_emb, (
                "TimeSformer(scan_layers=True) requires rotary_emb: the "
                "sincos context is broadcast into the scan body")
            from meant_tpu.nn.stack import scanned_stack
            return_x = scanned_stack(
                TSBlock, self.depth,
                dict(dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                     f=f, n=n, attn_dropout=self.attn_dropout,
                     ff_dropout=self.ff_dropout,
                     shift_tokens=self.shift_tokens, flash=self.flash,
                     dtype=self.dtype),
                name="layers_scan", n_ctx=2,
                remat=self.remat if self.remat else "dots")(
                    x, frame_rot, image_rot, deterministic)
            x = return_x
            if return_tokens:
                return x
            x = nn.LayerNorm(name="out_norm")(x[:, 0])
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            name="out_proj")(x)

        for i in range(self.depth):
            y = x
            if self.shift_tokens:
                y = token_shift(y, f)
            y = nn.LayerNorm(name=f"time_norm_{i}")(y)
            x = TSAttention(self.dim, self.dim_head, self.heads,
                            self.attn_dropout, flash=self.flash,
                            dtype=self.dtype,
                            name=f"time_attn_{i}")(
                y, group_size=f, num_groups=n, rot_sincos=frame_rot,
                group_axis_first=False, deterministic=deterministic) + x
            y = x
            if self.shift_tokens:
                y = token_shift(y, f)
            y = nn.LayerNorm(name=f"space_norm_{i}")(y)
            x = TSAttention(self.dim, self.dim_head, self.heads,
                            self.attn_dropout, flash=self.flash,
                            dtype=self.dtype,
                            name=f"space_attn_{i}")(
                y, group_size=n, num_groups=f, rot_sincos=image_rot,
                group_axis_first=True, deterministic=deterministic) + x
            y = x
            if self.shift_tokens:
                y = token_shift(y, f)
            y = nn.LayerNorm(name=f"ff_norm_{i}")(y)
            x = GEGLUFeedForward(self.dim, dropout=self.ff_dropout,
                                 dtype=self.dtype, name=f"ff_{i}")(
                y, deterministic=deterministic) + x
        if return_tokens:
            return x
        x = nn.LayerNorm(name="out_norm")(x[:, 0])
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="out_proj")(x)
