"""Normalization primitives (functional).

RMSNorm follows Zhang & Sennrich as vendored at `utils/rms_norm.py:16-57` in
the reference: partial-RMSNorm via `p`, eps added to the *RMS value* (not the
variance), default eps 1e-8, optional bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, offset=None,
             p: float = -1.0, eps: float = 1e-8) -> jnp.ndarray:
    """x / (rms(x) + eps) * scale [+ offset].

    Matches `utils/rms_norm.py:39-57`: when 0 <= p <= 1 only the first
    int(d * p) features contribute to the norm (partial RMSNorm); eps is added
    to the rms, not inside the sqrt.
    """
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    if p < 0.0 or p > 1.0:
        norm_sq = jnp.sum(xf * xf, axis=-1, keepdims=True)
        d_x = d
    else:
        partial = int(d * p)
        norm_sq = jnp.sum(xf[..., :partial] ** 2, axis=-1, keepdims=True)
        d_x = partial
    rms = jnp.sqrt(norm_sq) * (d_x ** -0.5)
    out = xf / (rms + eps) * scale.astype(jnp.float32)
    if offset is not None:
        out = out + offset.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """torch.nn.LayerNorm semantics (biased variance, eps inside sqrt)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + offset.astype(jnp.float32)
    return out.astype(x.dtype)
