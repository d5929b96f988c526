"""PyTorch oracle for parity tests.

An independent, from-the-spec torch implementation of the reference math
(SURVEY.md §2.1 / §2.6) used only as a numerical oracle in tests — it mirrors
the documented behavior of biirving/meant (including its quirks) without
importing or copying the reference code.
"""

import math

import torch


def rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


def lang_freqs(dim, theta=10000.0):
    return 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))


def pixel_freqs(dim, max_freq=10.0):
    return torch.linspace(1.0, max_freq / 2, dim // 2) * math.pi


def angles_for(positions, freqs):
    ang = torch.einsum("..., f -> ... f", positions.float(), freqs)
    return torch.repeat_interleave(ang, 2, dim=-1)


def apply_rotary(t, angles, scale=1.0):
    rot_dim = angles.shape[-1]
    t_mid, t_right = t[..., :rot_dim], t[..., rot_dim:]
    t_mid = t_mid * torch.cos(angles) * scale + rotate_half(t_mid) * torch.sin(angles) * scale
    return torch.cat((t_mid, t_right), dim=-1)


def xpos_scale(dim, positions, scale_base=512.0):
    base = (torch.arange(0, dim, 2).float() + 0.4 * dim) / (1.4 * dim)
    power = (positions.float() - positions.shape[-1] // 2) / scale_base
    scale = base ** power.unsqueeze(-1)
    return torch.cat((scale, scale), dim=-1)


def rotate_qk(q, k, freqs, rot_dim, scale_base=512.0):
    """xPos: angles/scale from q's length, broadcast over k."""
    seq = torch.arange(q.shape[-2])
    ang = angles_for(seq, freqs)
    scale = xpos_scale(rot_dim, seq, scale_base)
    return apply_rotary(q, ang, scale), apply_rotary(k, ang, scale ** -1)


def rms_norm(x, scale, p=-1.0, eps=1e-8, offset=None):
    d = x.shape[-1]
    if p < 0.0 or p > 1.0:
        norm_x = x.norm(2, dim=-1, keepdim=True)
        d_x = d
    else:
        partial = int(d * p)
        norm_x = x[..., :partial].norm(2, dim=-1, keepdim=True)
        d_x = partial
    rms = norm_x * d_x ** (-0.5)
    out = x / (rms + eps) * scale
    if offset is not None:
        out = out + offset
    return out


def attention(q, k, v, scale, causal=False, attention_mask=None):
    """q: (b, h, s_q, d); reference semantics: causal tril -inf fill then
    additive (1 - mask) * -1e9."""
    scores = torch.matmul(q, k.transpose(-2, -1)) * scale
    if causal:
        s_q, s_k = scores.shape[-2], scores.shape[-1]
        tri = torch.tril(torch.ones(s_q, s_k))
        scores = scores.masked_fill(tri == 0, float("-inf"))
    if attention_mask is not None:
        bias = (1 - attention_mask.float()).unsqueeze(1).unsqueeze(2) * -1e9
        scores = scores + bias
    weights = torch.softmax(scores, dim=-1)
    return torch.matmul(weights, v)
