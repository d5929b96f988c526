"""Torch mirror of the paper-generation `meant` model for end-to-end logit
parity (BASELINE.json: logits matching PyTorch to 1e-3).

Written from the behavioral spec in SURVEY.md §2.1-2.3 (with the shipped
defects patched exactly as documented); parameter names mirror the flax tree
so weights copy across mechanically. This is the oracle the judge's parity
claim rests on — keep it independent of meant_tpu internals.
"""

import math

import numpy as np
import torch
from torch import nn

import torch_ref as tr


def linear_from(flax_linear):
    kernel = np.asarray(flax_linear["dense"]["kernel"])  # (in, out)
    bias = np.asarray(flax_linear["dense"]["bias"])
    lin = nn.Linear(kernel.shape[0], kernel.shape[1])
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(kernel.T))
        lin.bias.copy_(torch.tensor(bias))
    return lin


class RMSNorm(nn.Module):
    def __init__(self, scale):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(np.asarray(scale)))

    def forward(self, x):
        return tr.rms_norm(x, self.scale)


class LayerNormP(nn.Module):
    def __init__(self, p):
        super().__init__()
        d = np.asarray(p["scale"]).shape[0]
        self.ln = nn.LayerNorm(d)
        with torch.no_grad():
            self.ln.weight.copy_(torch.tensor(np.asarray(p["scale"])))
            self.ln.bias.copy_(torch.tensor(np.asarray(p["offset"])))

    def forward(self, x):
        return self.ln(x)


class XPosAttention(nn.Module):
    def __init__(self, p, num_heads, causal=True):
        super().__init__()
        self.h = num_heads
        self.q = linear_from(p["q"])
        self.k = linear_from(p["k"])
        self.v = linear_from(p["v"])
        self.multi_mad = linear_from(p["multi_mad"])
        self.freqs = torch.tensor(np.asarray(p["freqs"]))
        self.causal = causal

    def forward(self, x, attention_mask=None):
        b, s, d = x.shape
        h = self.h
        dh = d // h

        def heads(t):
            return t.reshape(b, s, h, dh).permute(0, 2, 1, 3)

        q, k, v = heads(self.q(x)), heads(self.k(x)), heads(self.v(x))
        rot_dim = self.freqs.shape[-1] * 2
        q, k = tr.rotate_qk(q, k, self.freqs, rot_dim)
        scale = 1.0 / math.sqrt(d)
        out = tr.attention(q, k, v, scale, causal=self.causal,
                           attention_mask=attention_mask)
        out = out.permute(0, 2, 1, 3).reshape(b, s, d)
        return self.multi_mad(out)


class RotaryAttention(nn.Module):
    def __init__(self, p, num_heads):
        super().__init__()
        self.h = num_heads
        self.q = linear_from(p["q"])
        self.k = linear_from(p["k"])
        self.v = linear_from(p["v"])
        self.multi_mad = linear_from(p["multi_mad"])
        self.freqs = torch.tensor(np.asarray(p["freqs"]))

    def forward(self, x):
        b, s, d = x.shape
        h = self.h
        dh = d // h

        def heads(t):
            return t.reshape(b, s, h, dh).permute(0, 2, 1, 3)

        q, k, v = heads(self.q(x)), heads(self.k(x)), heads(self.v(x))
        ang = tr.angles_for(torch.arange(s), self.freqs)
        q = tr.apply_rotary(q, ang)
        k = tr.apply_rotary(k, ang)
        out = tr.attention(q, k, v, 1.0 / math.sqrt(d), causal=False)
        out = out.permute(0, 2, 1, 3).reshape(b, s, d)
        return self.multi_mad(out)


class LanguageEncoder(nn.Module):
    def __init__(self, p, num_heads):
        super().__init__()
        self.norm1 = RMSNorm(p["norm1"]["scale"])
        self.proj_in = linear_from(p["proj_in"])
        self.attn = XPosAttention(p["attn"], num_heads)
        self.norm2 = RMSNorm(p["norm2"]["scale"])
        self.proj_out = linear_from(p["proj_out"])
        self.norm3 = RMSNorm(p["norm3"]["scale"])
        self.ff_in = linear_from(p["ff_in"])
        self.norm4 = RMSNorm(p["norm4"]["scale"])
        self.ff_out = linear_from(p["ff_out"])

    def forward(self, x, attention_mask=None):
        inter = self.proj_out(self.norm2(self.attn(
            self.proj_in(self.norm1(x)), attention_mask)))
        x1 = inter + x
        inter = self.ff_out(self.norm4(
            torch.nn.functional.gelu(self.ff_in(self.norm3(x1)))))
        return inter + x1


class VisionEncoder(nn.Module):
    def __init__(self, p, num_heads):
        super().__init__()
        self.norm1 = RMSNorm(p["norm1"]["scale"])
        self.proj_in = linear_from(p["proj_in"])
        self.attn = RotaryAttention(p["attn"], num_heads)
        self.norm2 = RMSNorm(p["norm2"]["scale"])
        self.proj_out = linear_from(p["proj_out"])
        self.norm3 = RMSNorm(p["norm3"]["scale"])
        self.ff_in = linear_from(p["ff_in"])
        self.norm4 = RMSNorm(p["norm4"]["scale"])
        self.ff_out = linear_from(p["ff_out"])

    def forward(self, x):
        inter = self.proj_out(self.norm2(self.attn(
            self.proj_in(self.norm1(x)))))
        x1 = inter + x
        inter = self.ff_out(self.norm4(
            torch.nn.functional.gelu(self.ff_in(self.norm3(x1)))))
        return inter + x1


class TemporalEncoder(nn.Module):
    """paper style: temp_embedding + [RMSNorm, Linear, temporal, RMSNorm, Linear]."""

    def __init__(self, p, num_heads):
        super().__init__()
        self.temp_embedding = torch.tensor(np.asarray(p["temp_embedding"]))
        self.norm1 = RMSNorm(p["norm1"]["scale"])
        self.proj_in = linear_from(p["proj_in"])
        self.q = linear_from(p["temporal"]["q"])
        self.k = linear_from(p["temporal"]["k"])
        self.v = linear_from(p["temporal"]["v"])
        self.multi_mad = linear_from(p["temporal"]["multi_mad"])
        self.norm2 = RMSNorm(p["norm2"]["scale"])
        self.proj_out = linear_from(p["proj_out"])
        self.h = num_heads

    def forward(self, x):
        b, l, d = x.shape
        x = x + self.temp_embedding
        x = self.proj_in(self.norm1(x))
        h = self.h
        dh = d // h
        q = self.q(x[:, -1, :]).reshape(b, 1, h, dh).permute(0, 2, 1, 3)
        k = self.k(x).reshape(b, l, h, dh).permute(0, 2, 1, 3)
        v = self.v(x).reshape(b, l, h, dh).permute(0, 2, 1, 3)
        out = tr.attention(q, k, v, 1.0 / math.sqrt(dh * h))
        out = out.permute(0, 2, 1, 3).reshape(b, 1, h * dh)
        out = self.multi_mad(out)
        return self.proj_out(self.norm2(out))


class RobertaEmbeddings(nn.Module):
    def __init__(self, p, padding_idx=1):
        super().__init__()
        self.word = torch.tensor(np.asarray(p["word_embeddings"]))
        self.pos = torch.tensor(np.asarray(p["position_embeddings"]))
        self.tok = torch.tensor(np.asarray(p["token_type_embeddings"]))
        self.ln_scale = torch.tensor(np.asarray(p["ln_scale"]))
        self.ln_bias = torch.tensor(np.asarray(p["ln_bias"]))
        self.padding_idx = padding_idx

    def forward(self, input_ids):
        mask = (input_ids != self.padding_idx).long()
        position_ids = torch.cumsum(mask, dim=-1) * mask + self.padding_idx
        x = (self.word[input_ids] + self.pos[position_ids]
             + self.tok[torch.zeros_like(input_ids)])
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), self.ln_scale, self.ln_bias, eps=1e-5)


class Meant(nn.Module):
    """Mirror of meant_tpu.models.meant built from its flax params."""

    def __init__(self, params, num_heads, num_encoders, lag, patch_res):
        super().__init__()
        p = params["params"]
        self.embedding = RobertaEmbeddings(p["embedding"])
        self.lang = nn.ModuleList([
            LanguageEncoder(p[f"languageEncoders_{i}"], num_heads)
            for i in range(num_encoders)])
        self.patchEmbed = linear_from(p["patchEmbed"])
        self.vis = nn.ModuleList([
            VisionEncoder(p[f"visionEncoders_{i}"], num_heads)
            for i in range(num_encoders)])
        self.temporal = TemporalEncoder(p["temporal_encoding_0"], num_heads)
        self.head_norm = RMSNorm(p["mlpHead"]["norm"]["scale"])
        self.head_proj = linear_from(p["mlpHead"]["proj"])
        self.lag = lag
        self.patch_res = patch_res

    def forward(self, tweets, images, attention_mask=None):
        b, lag, s = tweets.shape
        words = self.embedding(tweets.reshape(b * lag, s))
        am = (attention_mask.reshape(b * lag, s)
              if attention_mask is not None else None)
        for enc in self.lang:
            words = enc(words, am)
        d_t = words.shape[-1]
        words = words.reshape(b, lag, s, d_t)

        _, _, c, H, W = images.shape
        p_res = self.patch_res
        imgs = images.reshape(b * lag, c, H, W)
        hh, ww = H // p_res, W // p_res
        imgs = imgs.reshape(b * lag, c, hh, p_res, ww, p_res)
        imgs = imgs.permute(0, 2, 4, 3, 5, 1).reshape(
            b * lag, hh * ww, p_res * p_res * c)
        imgs = self.patchEmbed(imgs)
        for enc in self.vis:
            imgs = enc(imgs)
        d_i = imgs.shape[-1]
        imgs = imgs.reshape(b, lag, -1, d_i)

        fused = torch.cat((words.mean(dim=2), imgs.mean(dim=2)), dim=2)
        fused = self.temporal(fused)
        out = torch.sigmoid(self.head_proj(self.head_norm(fused)))
        return out.squeeze(dim=1)
