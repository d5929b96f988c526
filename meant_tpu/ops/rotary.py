"""Rotary / xPos positional embeddings, TPU-first.

Functional re-design of the rotary machinery the reference vendors in
``meant/rotary_embedding_torch.py`` (Phil Wang's library) and
``src/utils/rotary.py``. Everything here is a pure function of static shapes so
XLA constant-folds the angle tables at trace time — the reference's per-seq-len
Python dict cache (`rotary_embedding_torch.py:115-147`) is unnecessary under jit.

Conventions replicated exactly (they matter for logit parity):

* Frequency layout is *interleaved-pairs*: ``repeat(freqs, 'n -> (n r)', r=2)``
  gives ``[f0, f0, f1, f1, ...]`` (`rotary_embedding_torch.py:140-141`), and
  ``rotate_half`` operates on interleaved pairs ``(-x2, x1)``
  (`rotary_embedding_torch.py:31-35`).
* The xPos decay scale is laid out *block-wise*, NOT interleaved:
  ``torch.cat((scale, scale), dim=-1)`` (`rotary_embedding_torch.py:128`),
  i.e. ``[s0..s_{d/2-1}, s0..s_{d/2-1}]`` — inconsistent with the freq layout
  but replicated faithfully.
* xPos power is centered: ``power = (pos - seq_len // 2) / scale_base``
  (`rotary_embedding_torch.py:126`). Queries are scaled by ``scale``; keys by
  ``scale ** -1`` (`rotary_embedding_torch.py:107-109`).
* Rotation only touches ``t[..., :rot_dim]``; the tail passes through
  (`rotary_embedding_torch.py:38-45`).

Frequency families (`rotary_embedding_torch.py:74-81`):
  lang:   1 / theta ** (arange(0, dim, 2) / dim)
  pixel:  linspace(1, max_freq / 2, dim // 2) * pi
  constant: ones(num_freqs)
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

# Static angle/frequency tables are built with numpy in float64 and truncated
# to fp32 — correctly-rounded constants that XLA folds at trace time.


def lang_freqs(dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Language-modality inverse frequencies, shape (dim // 2,)."""
    exponents = np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim
    return jnp.asarray(1.0 / (theta ** exponents), dtype=jnp.float32)


def pixel_freqs(dim: int, max_freq: float = 10.0) -> jnp.ndarray:
    """Pixel-modality frequencies, shape (dim // 2,)."""
    return jnp.asarray(np.linspace(1.0, max_freq / 2.0, dim // 2) * math.pi,
                       dtype=jnp.float32)


def constant_freqs(num_freqs: int = 1) -> jnp.ndarray:
    return jnp.ones((num_freqs,), dtype=jnp.float32)


def make_freqs(dim: int, freqs_for: str = "lang", theta: float = 10000.0,
               max_freq: float = 10.0, num_freqs: int = 1) -> jnp.ndarray:
    if freqs_for == "lang":
        return lang_freqs(dim, theta)
    if freqs_for == "pixel":
        return pixel_freqs(dim, max_freq)
    if freqs_for == "constant":
        return constant_freqs(num_freqs)
    raise ValueError(f"unknown modality {freqs_for}")


def rope_angles(positions: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Outer product of positions and freqs, each freq repeated twice
    consecutively (interleaved-pair layout). Output (..., 2 * len(freqs))."""
    ang = positions[..., None].astype(jnp.float32) * freqs  # (..., n)
    return jnp.repeat(ang, 2, axis=-1)  # [a0, a0, a1, a1, ...]


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation: (x1, x2) -> (-x2, x1)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack((-x2, x1), axis=-1).reshape(*x.shape[:-2], -1)


def apply_rotary(t: jnp.ndarray, angles: jnp.ndarray, scale=1.0,
                 start_index: int = 0) -> jnp.ndarray:
    """Rotate t[..., start:start+rot_dim] by angles; scale multiplies both the
    cos and sin terms (xPos). `angles` broadcasts against t's leading dims; for
    a (b, h, s, d) tensor pass angles of shape (s, rot_dim)."""
    rot_dim = angles.shape[-1]
    end_index = start_index + rot_dim
    assert rot_dim <= t.shape[-1], (
        f"feature dim {t.shape[-1]} too small to rotate {rot_dim} positions")
    t_left = t[..., :start_index]
    t_mid = t[..., start_index:end_index]
    t_right = t[..., end_index:]
    # Angle tables are fp32; rotate in fp32 and cast back (better than the
    # reference's in-dtype trig for bf16, identical for fp32).
    cos = jnp.cos(angles) * scale
    sin = jnp.sin(angles) * scale
    t_mid = (t_mid.astype(jnp.float32) * cos
             + rotate_half(t_mid.astype(jnp.float32)) * sin).astype(t.dtype)
    return jnp.concatenate((t_left, t_mid, t_right), axis=-1)


def xpos_scale(dim: int, positions: jnp.ndarray,
               scale_base: float = 512.0) -> jnp.ndarray:
    """xPos decay scale for a full sequence, shape (len(positions), dim).

    base = (arange(0, dim, 2) + 0.4 * dim) / (1.4 * dim)       # (dim/2,)
    power = (positions - len(positions) // 2) / scale_base     # centered
    out = concat(base ** power, base ** power)                 # block layout
    """
    base = (jnp.arange(0, dim, 2, dtype=jnp.float32) + 0.4 * dim) / (1.4 * dim)
    power = (positions.astype(jnp.float32) - positions.shape[-1] // 2) / scale_base
    scale = base ** power[..., None]  # (s, dim/2)
    return jnp.concatenate((scale, scale), axis=-1)  # (s, dim) block-wise


def rotate_queries_or_keys(t: jnp.ndarray, freqs: jnp.ndarray,
                           seq_axis: int = -2) -> jnp.ndarray:
    """Plain RoPE over the sequence axis (non-xPos path,
    `rotary_embedding_torch.py:96-100`). t: (..., s, d)."""
    seq_len = t.shape[seq_axis]
    angles = rope_angles(jnp.arange(seq_len), freqs)
    if seq_axis not in (-2, t.ndim - 2):
        # Positions must broadcast along seq_axis: move angle table accordingly.
        shape = [1] * t.ndim
        shape[seq_axis] = seq_len
        shape[-1] = angles.shape[-1]
        angles = angles.reshape(shape)
    return apply_rotary(t, angles)


def rotate_queries_and_keys(q: jnp.ndarray, k: jnp.ndarray, freqs: jnp.ndarray,
                            rot_dim: int, scale_base: float = 512.0,
                            k_len_from_q: bool = True):
    """xPos rotation (`rotary_embedding_torch.py:102-110`): q scaled by
    `scale`, k by `scale ** -1`, angles shared.

    The reference computes positions from q's length and lets broadcasting
    stretch them over k (quirk when q_len == 1: the angle/scale tables have one
    row, position 0 centered => identity — matching `src/meant/temporal.py`
    where the xPos rotation is effectively a no-op).
    """
    seq_len = q.shape[-2]
    positions = jnp.arange(seq_len)
    angles = rope_angles(positions, freqs)
    scale = xpos_scale(rot_dim, positions, scale_base)
    q_out = apply_rotary(q, angles, scale=scale)
    k_out = apply_rotary(k, angles, scale=scale ** -1)
    return q_out, k_out


# --- TimeSformer-style rotary (`src/utils/rotary.py`) -----------------------
#
# Different conventions from the vendored lib above: `rotate_every_two` is the
# same interleaved rotation, but apply_rot_emb takes precomputed (sin, cos)
# and the axial embedding interleaves ('n d -> n (d j)', j=2) AFTER
# concatenating the h/w halves.


def axial_rotary_sincos(dim: int, h: int, w: int, max_freq: float = 10.0):
    """2-D axial sin/cos tables for (h*w) patch tokens, each of width dim
    (`src/utils/rotary.py:28-50`). Returns (sin, cos) of shape (h*w, dim)."""
    scales = jnp.logspace(0.0, math.log(max_freq / 2) / math.log(2), dim // 4,
                          base=2.0, dtype=jnp.float32)
    h_seq = jnp.linspace(-1.0, 1.0, h)[:, None] * scales * math.pi  # (h, dim/4)
    w_seq = jnp.linspace(-1.0, 1.0, w)[:, None] * scales * math.pi  # (w, dim/4)
    x_sinu = jnp.broadcast_to(h_seq[:, None, :], (h, w, dim // 4))
    y_sinu = jnp.broadcast_to(w_seq[None, :, :], (h, w, dim // 4))
    sin = jnp.concatenate((jnp.sin(x_sinu), jnp.sin(y_sinu)), axis=-1)
    cos = jnp.concatenate((jnp.cos(x_sinu), jnp.cos(y_sinu)), axis=-1)
    sin = sin.reshape(h * w, dim // 2)
    cos = cos.reshape(h * w, dim // 2)
    # 'n d -> n (d j)', j=2  (interleave-duplicate each element)
    sin = jnp.repeat(sin, 2, axis=-1)
    cos = jnp.repeat(cos, 2, axis=-1)
    return sin, cos


def frame_rotary_sincos(dim: int, n: int):
    """1-D rotary sin/cos for n frames (`src/utils/rotary.py:52-61`).
    NOTE: this family uses the *block* layout `cat((freqs, freqs), -1)`,
    unlike the interleaved layout above — replicated faithfully."""
    inv_freqs = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    ang = jnp.arange(n, dtype=jnp.float32)[:, None] * inv_freqs  # (n, dim/2)
    ang = jnp.concatenate((ang, ang), axis=-1)  # block layout
    return jnp.sin(ang), jnp.cos(ang)


def apply_rot_emb_sincos(q: jnp.ndarray, k: jnp.ndarray, sin: jnp.ndarray,
                         cos: jnp.ndarray):
    """TimeSformer-style partial-dim rotation (`src/utils/rotary.py:13-19`)."""
    rot_dim = sin.shape[-1]

    def rot(t):
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        t_rot = t_rot * cos + rotate_half(t_rot) * sin
        return jnp.concatenate((t_rot, t_pass), axis=-1)

    return rot(q), rot(k)
