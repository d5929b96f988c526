"""Proof-of-defect tests: run the ACTUAL reference code and assert the
crashes documented in DEFECTS.md really occur (so "implements the patched
semantics" claims rest on evidence, not assertion). Skipped without the
reference mount."""

import os

import numpy as np
import pytest
import torch

from test_reference_parity import REF, _install_stubs

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "meant")),
                                reason="reference snapshot not mounted")


def _tiny_embedding():
    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0)
    return RobertaEmbeddings(cfg)


def test_defect1_meant_tweet_name_error():
    """DEFECTS #1: meant_tweet's languageEncoder returns undefined
    `final_resi` (`meant/meant_tweet.py:81`)."""
    _install_stubs()
    from meant.meant_tweet import meant_tweet as ref_model
    torch.manual_seed(0)
    ref = ref_model(text_dim=768, price_dim=4, lag=5, num_classes=2,
                    embedding=_tiny_embedding(), num_encoders=1).eval()
    tweets = torch.ones(2, 5, 16).long() * 3
    mask = torch.ones(2, 5, 16)
    with pytest.raises(NameError, match="final_resi"):
        with torch.no_grad():
            ref(tweets, attention_mask=mask)


def test_defect_meantPrice_4d_einops_crash():
    """meantPrice feeds 4-D (b, lag, s, d) tensors through attention whose
    einops pattern expects 3-D — crashes as shipped (SURVEY §2.3 note;
    meant_tpu implements the intended per-day semantics)."""
    _install_stubs()
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_ref_meantPrice", os.path.join(REF, "meant", "meantPrice.py"))
    # meantPrice.py uses bare `from attention import ...` — needs meant/ on
    # the path
    import sys
    sys.path.insert(0, os.path.join(REF, "meant"))
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(0)
        ref = mod.meant(text_dim=768, image_dim=768, price_dim=4, height=64,
                        width=64, patch_res=16, lag=5, num_classes=2,
                        embedding=_tiny_embedding(), num_encoders=1).eval()
        tweets = torch.ones(10, 16).long() * 3     # (b*lag, s) per forward
        images = torch.zeros(2, 5, 4, 64, 64)
        prices = torch.zeros(2, 5, 4)
        with pytest.raises(Exception):             # einops/shape error
            with torch.no_grad():
                ref(tweets, images, prices)
    finally:
        sys.path.remove(os.path.join(REF, "meant"))


def test_defect15_layernorm1_projection_constant():
    """DEFECTS #15: the src fusion's LayerNorm(1) collapses any input to its
    bias — verified on the actual reference module structure."""
    ln = torch.nn.LayerNorm(1)
    x = torch.randn(4, 7, 1) * 100
    out = ln(x)
    assert torch.allclose(out, torch.zeros_like(out), atol=1e-5)


def test_defect18_meant_mosi_fusion_shape_crash():
    """DEFECTS #18: meant_mosi's fusion concatenates (b, 768) with
    (b, 20, 768) — shape-invalid as shipped (`src/meant/meant_mosi.py:
    352-355`). positional_encodings is stubbed with faithful sinusoidal
    semantics so the forward reaches the broken concat."""
    import sys
    import types
    import math
    _install_stubs()

    # stub positional_encodings.torch_encodings (not installed):
    # PositionalEncodingPermute1D + Summer ≡ add channels-last sinusoidal PE
    pe_mod = types.ModuleType("positional_encodings.torch_encodings")

    class PositionalEncodingPermute1D(torch.nn.Module):
        def __init__(self, channels):
            super().__init__()
            self.channels = channels

        def forward(self, x):
            b, s, d = x.shape
            pos = torch.arange(s).float().unsqueeze(1)
            div = torch.exp(torch.arange(0, d, 2).float()
                            * (-math.log(10000.0) / d))
            pe = torch.zeros(s, d)
            pe[:, 0::2] = torch.sin(pos * div)
            pe[:, 1::2] = torch.cos(pos * div)[:, : d // 2]
            return pe.unsqueeze(0).expand(b, s, d)

    class Summer(torch.nn.Module):
        def __init__(self, penc):
            super().__init__()
            self.penc = penc

        def forward(self, x):
            return x + self.penc(x)

        def cuda(self):
            return self

    pe_mod.PositionalEncodingPermute1D = PositionalEncodingPermute1D
    pe_mod.Summer = Summer
    pkg = types.ModuleType("positional_encodings")
    pkg.torch_encodings = pe_mod
    sys.modules["positional_encodings"] = pkg
    sys.modules["positional_encodings.torch_encodings"] = pe_mod

    import src.meant.meant_mosi as ref_mod
    torch.manual_seed(9)

    class PassEmbedding(torch.nn.Module):
        def forward(self, x, attention_mask=None):
            return x

    ref = ref_mod.meant_mosi(text_dim=768, image_dim=768, height=20,
                             width=1, patch_res=1, lag=50, num_classes=2,
                             embedding=PassEmbedding(),
                             num_encoders=1).eval()
    rng = np.random.RandomState(9)
    batch = {
        "input_ids": torch.tensor(rng.randn(2, 50, 768).astype(np.float32)),
        "pixels": torch.tensor(rng.randn(2, 50, 20).astype(np.float32)),
        "audio": torch.tensor(rng.randn(2, 50, 130).astype(np.float32)),
        "audio_mask": torch.ones(2, 50),
        "attention_mask": torch.ones(2, 50),
    }
    orig_half = torch.Tensor.half
    torch.Tensor.half = lambda self: self
    try:
        with pytest.raises(Exception):  # shape-invalid concat / cuda call
            with torch.no_grad():
                ref.forward(**batch)
    finally:
        torch.Tensor.half = orig_half
