"""Image patchification.

The reference patchifies with an einops Rearrange + Linear
(`meant/meant.py:193-195`): 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)' —
token order row-major over (h, w); feature order (p1, p2, c), i.e. channel
fastest. On TPU this is one reshape/transpose pair that XLA fuses into the
following projection matmul.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(images: jnp.ndarray, patch_res: int) -> jnp.ndarray:
    """(b, c, H, W) -> (b, (H/p)*(W/p), p*p*c), feature order (p1, p2, c)."""
    b, c, H, W = images.shape
    p = patch_res
    h, w = H // p, W // p
    x = images.reshape(b, c, h, p, w, p)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # b h w p1 p2 c
    return x.reshape(b, h * w, p * p * c)
