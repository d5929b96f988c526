"""Scaled dot-product attention — XLA reference implementations.

This module is the behavioral spec for the MEANT attention family; the Pallas
flash kernels in `meant_tpu/ops/flash/` must match these to fp32 tolerance.
Reference semantics replicated (see SURVEY.md §2.6 for the quirk ledger):

* Scale variants:
    - paper/top-level ops divide scores by sqrt(Dh * num_heads) == sqrt(dim)
      (`meant/xPosAttention.py:41`, `meant/attention.py:43`,
       `meant/temporal.py:44`);
    - src-era temporal divides by sqrt(Dh) (`src/meant/temporal.py:52`);
    - the vision flash path uses softmax_scale = 1 / dim
      (`meant/flash_attention.py:42`).
  Scale is therefore always an explicit argument here.
* Causal mask: tril over (s_q, s_k), -inf fill (`meant/xPosAttention.py:43-50`).
  The vanilla `attention` op's mask closure is a no-op bug
  (`meant/attention.py:46-52`) — modeled by simply passing causal=False.
* Padding mask: additive `(1 - attention_mask) * -1e9` added AFTER the causal
  fill (`meant/xPosAttention.py:54-56`), mask shape (batch, s_k), 1 = keep.
* Score dropout: the reference applies dropout to raw scores BEFORE softmax
  (`meant/xPosAttention.py:59`) with p=0 by default — inert in practice, so it
  is not reproduced; training-mode dropout belongs to the module layer.

All matmuls accumulate in fp32 (`preferred_element_type`) so bf16 inputs keep
MXU throughput without losing the softmax numerics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, scale: float,
           causal: bool = False,
           attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference attention. q: (..., s_q, d), k/v: (..., s_k, d).

    attention_mask: optional (batch, s_k) of {0, 1}; broadcasts over heads and
    queries with the reference's additive -1e9 convention.
    Returns (..., s_q, d) in q.dtype.
    """
    # Keep matmul inputs in their storage dtype (bf16 models hit the MXU at
    # full rate) while ACCUMULATING in fp32; the softmax chain stays fp32.
    scores = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        s_q, s_k = scores.shape[-2], scores.shape[-1]
        # tril over the TRAILING square: reference builds tril(ones(s_k, s_k))
        # and broadcasts, which for s_q == s_k is standard causal.
        row = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 1)
        scores = jnp.where(col <= row + (s_k - s_q), scores, NEG_INF)
    if attention_mask is not None:
        # (b, s_k) -> (b, 1, 1, s_k); additive -1e9 on masked keys.
        bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
        bias = bias[:, None, None, :]
        scores = scores + bias
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("...qk,...kd->...qd", weights, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attend_bshd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                scale: float, causal: bool = False,
                attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transpose-free attention in the (b, s, h, d) layout — the TPU-fast
    path (no head transposes; XLA feeds the MXU directly from the fused QKV
    matmul). Same numerics as `attend`."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        s_q, s_k = scores.shape[-2], scores.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (s_q, s_k), 1)
        scores = jnp.where(col <= row + (s_k - s_q), scores, NEG_INF)
    if attention_mask is not None:
        bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
        scores = scores + bias[:, None, None, :]
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(b, s, h*d) -> (b, h, s, d)."""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, s, d) -> (b, s, h*d)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
