"""Flash attention dispatch (Pallas kernel with fused rotary/xPos).

Replaces the reference's `flash_attn_func` call sites
(`meant/xPosAttention_flash.py:41`, `meant/flash_attention.py:42`) with a
TPU-native blockwise kernel. Until the Pallas kernel lands this falls back to
the XLA reference path (identical math; XLA already fuses the softmax chain —
the Pallas kernel's win is avoiding the materialized (s, s) score matrix and
fusing the rotation into the Q/K load).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from meant_tpu import ops


def flash_attention(q, k, v, *, scale: float, causal: bool = False,
                    attention_mask: Optional[jnp.ndarray] = None,
                    rope_freqs: Optional[jnp.ndarray] = None,
                    xpos: bool = False, xpos_scale_base: float = 512.0):
    """q, k, v: (b, h, s, d). Applies rotary (plain or xPos) to q/k then
    attends. Numerics match meant_tpu.ops.attend."""
    if rope_freqs is not None:
        rot_dim = 2 * rope_freqs.shape[-1]
        if xpos:
            q, k = ops.rotate_queries_and_keys(q, k, rope_freqs,
                                               rot_dim=rot_dim,
                                               scale_base=xpos_scale_base)
        else:
            q = ops.rotate_queries_or_keys(q, rope_freqs)
            k = ops.rotate_queries_or_keys(k, rope_freqs)
    return ops.attend(q, k, v, scale=scale, causal=causal,
                      attention_mask=attention_mask)
