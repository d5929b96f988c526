"""Flash attention dispatch: builds fused rotation tables from the module's
frequency params and calls the Pallas kernel (meant_tpu/ops/flash/kernel.py).

Replaces the reference's `flash_attn_func` call sites
(`meant/xPosAttention_flash.py:41`, `meant/flash_attention.py:42`) with a
TPU-native blockwise kernel; numerics match meant_tpu.ops.attend applied to
rotated q/k (tested in tests/test_flash.py). On non-TPU backends the kernel
runs in interpreter mode (tests) — production path is TPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from meant_tpu.ops.flash.kernel import flash_mha
from meant_tpu.ops.rotary import rope_angles, xpos_scale


def _tables(seq_len: int, d_head: int, freqs, xpos: bool,
            scale_base: float):
    """Build (s, d) qcos/qsin/kcos/ksin fp32 tables: rotary angles on the
    leading rot_dim features (xPos q/k decay scales folded in), identity
    (cos=1, sin=0) on the pass-through tail."""
    positions = jnp.arange(seq_len)
    angles = rope_angles(positions, freqs)          # (s, rot_dim)
    rot_dim = angles.shape[-1]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    if xpos:
        scale = xpos_scale(rot_dim, positions, scale_base)  # (s, rot_dim)
        q_cos, q_sin = cos * scale, sin * scale
        k_cos, k_sin = cos / scale, sin / scale
    else:
        q_cos = k_cos = cos
        q_sin = k_sin = sin
    pad_c = jnp.ones((seq_len, d_head - rot_dim), jnp.float32)
    pad_s = jnp.zeros((seq_len, d_head - rot_dim), jnp.float32)
    qcos = jnp.concatenate([q_cos, pad_c], axis=-1)
    qsin = jnp.concatenate([q_sin, pad_s], axis=-1)
    kcos = jnp.concatenate([k_cos, pad_c], axis=-1)
    ksin = jnp.concatenate([k_sin, pad_s], axis=-1)
    return qcos, qsin, kcos, ksin


def flash_attention(q, k, v, *, scale: float, causal: bool = False,
                    attention_mask: Optional[jnp.ndarray] = None,
                    rope_freqs: Optional[jnp.ndarray] = None,
                    xpos: bool = False, xpos_scale_base: float = 512.0):
    """q, k, v: (b, h, s, d). Rotary (plain or xPos) fused into the kernel's
    Q/K load. attention_mask: (b, s_k) of {0,1}."""
    d = q.shape[-1]
    s_q = q.shape[2]
    if rope_freqs is not None:
        qcos, qsin, kcos, ksin = _tables(s_q, d, rope_freqs, xpos,
                                         xpos_scale_base)
    else:
        qcos = qsin = kcos = ksin = None
    return flash_mha(q, k, v, scale=scale, causal=causal,
                     attention_mask=attention_mask,
                     qcos=qcos, qsin=qsin, kcos=kcos, ksin=ksin)
