"""meant_mosi BRANCH parity vs the actual reference torch code
(`src/meant/meant_mosi.py`). The shipped fusion is shape-invalid
(DEFECTS #18, proven in test_reference_defects), so each branch is compared
up to the fusion point at ported weights:

  * text:   the MOSI file's own languageEncoder (xPos rot dim 30!)
  * video:  the patch-1 TimeSformer on 20-feature frames
  * audio:  cls-prepend + Permute1D positional encoding + 3-layer torch
            TransformerEncoder, INCLUDING the src_key_padding_mask
            convention quirk (1=valid collator masks mark valid tokens as
            PAD in torch's convention)

positional_encodings is not installed; the torch oracle here implements the
library's true semantics (permute to (b, x, ch), interleaved sin/cos table,
permute back) — the TRANSPOSED application the reference actually computes
when handed a channels-last (b, s+1, 130) tensor."""

import math
import os
import sys
import types

import numpy as np
import pytest

import torch
from torch import nn

from test_reference_parity import _install_stubs, REF

pytestmark = [
    pytest.mark.heavy,  # torch reference oracle
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "src")),
        reason="reference snapshot not mounted"),
]


def _install_pe_stub():
    """positional_encodings.torch_encodings with the TRUE library
    semantics (tatp22/multidim-positional-encoding >= 5.x)."""
    pe_mod = types.ModuleType("positional_encodings.torch_encodings")

    class PositionalEncoding1D(nn.Module):
        def __init__(self, channels):
            super().__init__()
            self.org_channels = channels
            self.channels = int(math.ceil(channels / 2) * 2)

        def forward(self, tensor):                     # (b, x, ch)
            b, x, ch = tensor.shape
            inv_freq = 1.0 / (10000 ** (
                torch.arange(0, self.channels, 2).float() / self.channels))
            pos = torch.arange(x).float()
            ang = torch.einsum("i,j->ij", pos, inv_freq)
            emb = torch.stack((ang.sin(), ang.cos()), dim=-1).flatten(-2)
            return emb[None, :, :ch].expand(b, x, ch)

    class PositionalEncodingPermute1D(nn.Module):
        def __init__(self, channels):
            super().__init__()
            self.penc = PositionalEncoding1D(channels)

        def forward(self, tensor):                     # (b, ch, x)
            t = tensor.permute(0, 2, 1)
            return self.penc(t).permute(0, 2, 1)

    class Summer(nn.Module):
        def __init__(self, penc):
            super().__init__()
            self.penc = penc

        def forward(self, tensor):
            return tensor + self.penc(tensor)

        def cuda(self):
            return self

    pe_mod.PositionalEncoding1D = PositionalEncoding1D
    pe_mod.PositionalEncodingPermute1D = PositionalEncodingPermute1D
    pe_mod.Summer = Summer
    pkg = types.ModuleType("positional_encodings")
    pkg.torch_encodings = pe_mod
    sys.modules["positional_encodings"] = pkg
    sys.modules["positional_encodings.torch_encodings"] = pe_mod
    return pe_mod


class PassEmbedding(nn.Module):
    def forward(self, x, attention_mask=None):
        return x


def _build_ref(lag=6):
    _install_stubs()
    _install_pe_stub()
    import src.meant.meant_mosi as ref_mod
    torch.manual_seed(21)
    return ref_mod.meant_mosi(text_dim=768, image_dim=768, height=20,
                              width=1, patch_res=1, lag=lag, num_classes=2,
                              embedding=PassEmbedding(),
                              num_encoders=1).eval()


def test_mosi_text_branch_parity():
    ref = _build_ref()
    rng = np.random.RandomState(21)
    b, s = 2, 16
    x = (rng.randn(b, s, 768) * 0.5).astype(np.float32)
    mask = np.ones((b, s), np.float32)
    mask[0, 12:] = 0
    with torch.no_grad():
        ref_out = ref.languageEncoders[0].forward(
            torch.tensor(x), attention_mask=torch.tensor(mask)).numpy()

    import jax.numpy as jnp
    from meant_tpu.nn.encoders import LanguageEncoder
    from meant_tpu.utils import port
    params = port.encoder_params(
        dict(ref.state_dict()), "languageEncoders.0", norm="layer",
        ff_norm2="rms", xpos_prefix="languageEncoders.0.xPos")
    mod = LanguageEncoder(768, 8, norm="layer", ff_norm2="rms",
                          init_style="xavier", rot_dim=30)
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"mosi text branch parity violated: {diff}"


def test_mosi_video_branch_parity():
    lag = 6
    ref = _build_ref(lag=lag)
    rng = np.random.RandomState(22)
    b = 2
    pixels = (rng.randn(b, lag, 20) * 0.5).astype(np.float32)
    video = torch.tensor(pixels).unsqueeze(2).unsqueeze(3)  # (b,f,1,1,20)
    orig_half = torch.Tensor.half
    torch.Tensor.half = lambda self: self
    try:
        with torch.no_grad():
            ref_tokens = ref.timesformer.meant_forward(video).numpy()
    finally:
        torch.Tensor.half = orig_half

    import jax.numpy as jnp
    from meant_tpu.nn.timesformer import TimeSformer
    from meant_tpu.utils import port
    params = port.import_timesformer(dict(ref.state_dict()), depth=1,
                                     prefix="timesformer.")
    mod = TimeSformer(dim=768, image_size=20, patch_size=1, num_frames=lag,
                      num_classes=2, depth=1, heads=8, dim_head=64,
                      attn_dropout=0.1, ff_dropout=0.1, channels=1)
    out = np.asarray(mod.apply({"params": params},
                               jnp.asarray(pixels)[:, :, None, None, :],
                               return_tokens=True, deterministic=True))
    diff = np.abs(out - ref_tokens).max()
    assert diff <= 1e-3, f"mosi video branch parity violated: {diff}"


def test_mosi_audio_branch_parity():
    """Audio branch incl. the mask-convention quirk: collator 1=valid masks
    become torch src_key_padding_mask (True=PAD) — valid tokens are the
    ones IGNORED."""
    ref = _build_ref()
    from positional_encodings.torch_encodings import (
        PositionalEncodingPermute1D, Summer)
    rng = np.random.RandomState(23)
    b, s = 2, 12
    audio = (rng.randn(b, s, 130) * 0.5).astype(np.float32)
    mask = np.zeros((b, s), np.float32)
    mask[0, 8:] = 1   # "valid"=1 for the tail — torch will IGNORE those
    with torch.no_grad():
        a, m = ref.prepend_cls(torch.tensor(audio), torch.tensor(mask))
        a = Summer(PositionalEncodingPermute1D(a.shape[1]))(a)
        # the shipped code passes the PRE-cls mask (b, s) for a (b, s+1)
        # sequence and CRASHES (DEFECTS #24, proven below) — the runnable
        # intended semantics use prepend_cls's own mask `m`
        ref_out = ref.audio_encoder(
            a, src_key_padding_mask=m.bool()).numpy()

    import jax.numpy as jnp
    from meant_tpu.models.meant_timesformer import AudioEncoder
    from meant_tpu.utils import port
    params = port.import_audio_encoder(dict(ref.state_dict()))
    mod = AudioEncoder()
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(audio),
                               jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"mosi audio branch parity violated: {diff}"


def test_defect24_audio_mask_shape_crash():
    """DEFECTS #24: `meant_mosi.forward` passes the PRE-cls audio mask
    (b, s) as src_key_padding_mask for the (b, s+1) cls-prepended sequence
    (`src/meant/meant_mosi.py:323,328`) — torch rejects the shape, so the
    shipped audio branch crashes whenever a mask is supplied."""
    ref = _build_ref()
    from positional_encodings.torch_encodings import (
        PositionalEncodingPermute1D, Summer)
    rng = np.random.RandomState(24)
    b, s = 2, 12
    audio = torch.tensor((rng.randn(b, s, 130) * 0.5).astype(np.float32))
    mask = torch.ones(b, s)
    with torch.no_grad():
        a, _ = ref.prepend_cls(audio, mask)
        a = Summer(PositionalEncodingPermute1D(a.shape[1]))(a)
        with pytest.raises(Exception):
            ref.audio_encoder(a, src_key_padding_mask=mask.bool())
