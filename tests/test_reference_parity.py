"""TRUE reference parity: load the actual biirving/meant torch code from
/root/reference (read-only), run its `meant` model, port its state_dict
through meant_tpu.utils.port, and compare logits at <= 1e-3 (BASELINE.json).

The reference's unavailable CUDA/third-party deps are stubbed at import time:
  * flash_attn        — never called (flash gating requires Ampere CUDA);
  * rotary_embedding_torch — API-compatible shim built on tests/torch_ref
    math (the reference vendors the same library at
    meant/rotary_embedding_torch.py; the shim reproduces its documented
    semantics: interleaved freqs, block-layout xPos scale, partial-dim
    rotation, per-seq-len caching irrelevant here);
  * utils             — only RMSNorm is needed; loaded directly from
    reference/utils/rms_norm.py to avoid its dataset imports.

Skipped when /root/reference is not mounted.
"""

import importlib.machinery
import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

import torch
from torch import nn

REF = "/root/reference"

pytestmark = [
    pytest.mark.heavy,  # torch reference oracle
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "meant")),
        reason="reference snapshot not mounted"),
]


def _install_stubs():
    # flash_attn: imported at module top, never called on CPU
    fa = types.ModuleType("flash_attn")
    fa.flash_attn_qkvpacked_func = None
    fa.flash_attn_func = None
    fa.__spec__ = importlib.machinery.ModuleSpec("flash_attn", None)
    fa.__version__ = "0.0.0-stub"
    sys.modules.setdefault("flash_attn", fa)

    # utils: only RMSNorm, loaded from the reference file itself
    spec = importlib.util.spec_from_file_location(
        "_ref_rms", os.path.join(REF, "utils", "rms_norm.py"))
    rms_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rms_mod)
    utils_stub = types.ModuleType("utils")
    utils_stub.RMSNorm = rms_mod.RMSNorm
    sys.modules["utils"] = utils_stub

    # rotary_embedding_torch: API-compatible shim
    import torch_ref as tr

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, custom_freqs=None, freqs_for="lang",
                     theta=10000, max_freq=10, num_freqs=1,
                     learned_freq=False, use_xpos=False,
                     xpos_scale_base=512):
            super().__init__()
            if custom_freqs is not None:
                freqs = custom_freqs
            elif freqs_for == "lang":
                freqs = tr.lang_freqs(dim, theta)
            elif freqs_for == "pixel":
                freqs = tr.pixel_freqs(dim, max_freq)
            else:
                freqs = torch.ones(num_freqs)
            self.freqs = nn.Parameter(freqs, requires_grad=learned_freq)
            self.use_xpos = use_xpos
            self.scale_base = xpos_scale_base
            self.rot_dim = 2 * (dim // 2)

        def rotate_queries_or_keys(self, t, seq_dim=-2):
            seq = torch.arange(t.shape[seq_dim])
            ang = tr.angles_for(seq, self.freqs)
            return tr.apply_rotary(t, ang)

        def rotate_queries_and_keys(self, q, k, seq_dim=-2):
            return tr.rotate_qk(q, k, self.freqs, self.rot_dim,
                                self.scale_base)

    rot = types.ModuleType("rotary_embedding_torch")
    rot.RotaryEmbedding = RotaryEmbedding
    rot.apply_rotary_emb = tr.apply_rotary
    rot.broadcat = lambda tensors, dim=-1: torch.cat(tensors, dim=dim)
    sys.modules["rotary_embedding_torch"] = rot

    if REF not in sys.path:
        sys.path.insert(0, REF)


def test_true_reference_logit_parity():
    _install_stubs()
    from meant.meant import meant as ref_meant  # the REAL reference model

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig

    torch.manual_seed(0)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    embedding = RobertaEmbeddings(cfg)

    ref = ref_meant(text_dim=768, image_dim=768, price_dim=4, height=64,
                    width=64, patch_res=16, lag=5, num_classes=2,
                    embedding=embedding, flash=False, num_heads=8,
                    num_encoders=1, channels=4).eval()

    rng = np.random.RandomState(0)
    b, lag, s = 2, 5, 16
    tweets = rng.randint(2, 100, size=(b, lag, s)).astype(np.int64)
    tweets[:, :, 12:] = 1
    mask = np.ones((b, lag, s), np.float32)
    mask[:, :, 12:] = 0
    images = (rng.randn(b, lag, 4, 64, 64) * 0.5).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(tweets), torch.tensor(images),
                      torch.tensor(mask)).numpy()

    # port the REAL reference weights into the TPU model
    import jax
    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meant as tpu_meant
    from meant_tpu.utils import port

    sd = {k: v for k, v in ref.state_dict().items()}
    params = port.import_meant(sd, num_encoders=1)
    model = tpu_meant(text_dim=768, image_dim=768, price_dim=4, height=64,
                      width=64, patch_res=16, lag=5, num_classes=2,
                      embedding=EmbeddingConfig(
                          vocab_size=100, hidden_size=768,
                          max_position_embeddings=40, dropout=0.0),
                      num_heads=8, num_encoders=1, channels=4)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(tweets.astype(np.int32)),
                                 jnp.asarray(images), jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"true reference parity violated: {diff}"


def test_true_reference_meant_vision_parity():
    _install_stubs()
    from meant.meant_vision import meant_vision as ref_vision

    torch.manual_seed(1)
    ref = ref_vision(image_dim=768, price_dim=4, height=64, width=64,
                     patch_res=16, lag=5, num_classes=2, flash=False,
                     num_heads=8, num_encoders=1, channels=4).eval()
    rng = np.random.RandomState(1)
    images = (rng.randn(2, 5, 4, 64, 64) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(images)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import meant_vision as tpu_vision
    from meant_tpu.utils import port
    params = port.import_meant_vision(dict(ref.state_dict()),
                                      num_encoders=1)
    model = tpu_vision(image_dim=768, price_dim=4, height=64, width=64,
                       patch_res=16, lag=5, num_classes=2, num_heads=8,
                       num_encoders=1, channels=4)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(images)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_vision reference parity violated: {diff}"


def test_true_reference_meant_tweet_no_lag_parity():
    _install_stubs()
    from meant.meant_tweet_no_lag import meant_tweet_no_lag as ref_model

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(2)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    ref = ref_model(text_dim=768, price_dim=4, height=64, width=64,
                    patch_res=16, num_classes=2,
                    embedding=RobertaEmbeddings(cfg), num_heads=8,
                    num_encoders=1, channels=4).eval()
    rng = np.random.RandomState(2)
    tweets = rng.randint(2, 100, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        ref_out = ref(torch.tensor(tweets)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models import meant_tweet_no_lag as tpu_model
    from meant_tpu.utils import port
    params = port.import_meant_tweet_no_lag(dict(ref.state_dict()),
                                            num_encoders=1)
    model = tpu_model(text_dim=768, price_dim=4, height=64, width=64,
                      patch_res=16, num_classes=2,
                      embedding=EmbeddingConfig(
                          vocab_size=100, hidden_size=768,
                          max_position_embeddings=40, dropout=0.0),
                      num_heads=8, num_encoders=1, channels=4)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(tweets.astype(np.int32))))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"no_lag reference parity violated: {diff}"


def test_true_reference_meant_src_parity():
    """src-era meant (the TempStockLarge benchmark model) — the reference's
    `.half()` cast before the temporal stage is patched to identity (CPU
    torch can't mix fp16/fp32 modules the way CUDA autocast did); the TPU
    model runs fp32, so the comparison covers everything but that cast."""
    _install_stubs()
    import src.meant.meant as ref_mod

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(3)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    # the reference hard-codes image_proj = Linear(196, 1)
    # (`src/meant/meant.py:259`) so images must be 224x224/patch16
    ref = ref_mod.meant(text_dim=768, image_dim=768, price_dim=5, height=224,
                        width=224, patch_res=16, lag=5, num_classes=2,
                        embedding=RobertaEmbeddings(cfg), flash=False,
                        num_heads=8, num_encoders=1, channels=3,
                        seq_len=32).eval()

    rng = np.random.RandomState(3)
    b, lag, s = 2, 5, 16
    batch = {
        "input_ids": torch.tensor(
            rng.randint(2, 100, size=(b, lag, s)).astype(np.int64)),
        "pixels": torch.tensor(
            (rng.randn(b, lag, 3, 224, 224) * 0.5).astype(np.float32)),
        "prices": torch.tensor(rng.randn(b, lag, 5).astype(np.float32)),
        "attention_mask": torch.ones(b, lag, s),
    }
    orig_half = torch.Tensor.half
    torch.Tensor.half = lambda self: self
    try:
        with torch.no_grad():
            ref_out = ref.forward(**batch).numpy()
    finally:
        torch.Tensor.half = orig_half

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meant_src
    from meant_tpu.utils import port
    params = port.import_meant_src(dict(ref.state_dict()), num_encoders=1)
    model = meant_src(text_dim=768, image_dim=768, price_dim=5, height=224,
                      width=224, patch_res=16, lag=5, num_classes=2,
                      embedding=EmbeddingConfig(
                          vocab_size=100, hidden_size=768,
                          max_position_embeddings=40, dropout=0.0),
                      num_heads=8, num_encoders=1, channels=3, seq_len=32)
    out = np.asarray(model.apply(
        {"params": params},
        input_ids=jnp.asarray(np.asarray(batch["input_ids"], np.int32)),
        pixels=jnp.asarray(np.asarray(batch["pixels"])),
        prices=jnp.asarray(np.asarray(batch["prices"])),
        attention_mask=jnp.asarray(np.asarray(batch["attention_mask"],
                                              np.float32))))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_src reference parity violated: {diff}"


def test_true_reference_meant_vqa_parity():
    _install_stubs()
    from meant.meant_vqa import meant_vqa as ref_model

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(4)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    ref = ref_model(text_dim=768, image_dim=768, price_dim=4, height=64,
                    width=64, patch_res=16, lag=1, num_classes=7,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=8, num_encoders=1, channels=4).eval()
    rng = np.random.RandomState(4)
    tweets = rng.randint(2, 100, size=(2, 16)).astype(np.int64)
    images = (rng.randn(2, 4, 64, 64) * 0.5).astype(np.float32)
    mask = np.ones((2, 16), np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(tweets), torch.tensor(images),
                      torch.tensor(mask)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models import meant_vqa as tpu_model
    from meant_tpu.utils import port
    params = port.import_meant_vqa(dict(ref.state_dict()), num_encoders=1)
    model = tpu_model(text_dim=768, image_dim=768, price_dim=4, height=64,
                      width=64, patch_res=16, lag=1, num_classes=7,
                      embedding=EmbeddingConfig(
                          vocab_size=100, hidden_size=768,
                          max_position_embeddings=40, dropout=0.0),
                      num_heads=8, num_encoders=1, channels=4)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(tweets.astype(np.int32)),
                                 jnp.asarray(images), jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_vqa reference parity violated: {diff}"


def test_true_reference_timesformer_parity():
    """The divided space-time attention verified against the REAL reference
    TimeSformer (`src/meant/timesformer_pytorch.py`): full token sequence
    (meant_forward) and classification logits at ported weights."""
    _install_stubs()
    from src.meant.timesformer_pytorch import TimeSformer as RefTS

    torch.manual_seed(5)
    ref = RefTS(dim=64, num_frames=5, num_classes=3, image_size=32,
                patch_size=16, channels=3, depth=2, heads=4, dim_head=16,
                attn_dropout=0.0, ff_dropout=0.0, rotary_emb=True).eval()
    rng = np.random.RandomState(5)
    video = (rng.randn(2, 5, 3, 32, 32) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_tokens = ref.meant_forward(torch.tensor(video)).numpy()
        ref_logits = ref(torch.tensor(video)).numpy()

    import jax
    import jax.numpy as jnp
    from meant_tpu.nn.timesformer import TimeSformer
    from meant_tpu.utils import port
    params = port.import_timesformer(dict(ref.state_dict()), depth=2)
    model = TimeSformer(dim=64, num_frames=5, num_classes=3, image_size=32,
                        patch_size=16, channels=3, depth=2, heads=4,
                        dim_head=16, attn_dropout=0.0, ff_dropout=0.0,
                        rotary_emb=True)
    tokens = np.asarray(model.apply({"params": params}, jnp.asarray(video),
                                    return_tokens=True))
    logits = np.asarray(model.apply({"params": params}, jnp.asarray(video)))
    tok_diff = np.abs(tokens - ref_tokens).max()
    log_diff = np.abs(logits - ref_logits).max()
    assert tok_diff <= 1e-3, f"timesformer token parity violated: {tok_diff}"
    assert log_diff <= 1e-3, f"timesformer logit parity violated: {log_diff}"


def test_true_reference_meant_timesformer_parity():
    """Full src-era meant_timesformer (TimeSformer image branch,
    attention-weighted text pooling, src temporal) at ported weights; the
    .half() cast is identity-patched as in the meant_src test. Image size
    must be 224 (image_prep hard-codes 981 tokens)."""
    _install_stubs()
    import src.meant.meant_timesformer as ref_mod

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(6)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0)
    ref = ref_mod.meant_timesformer(
        text_dim=768, image_dim=768, price_dim=5, height=224, width=224,
        patch_res=16, lag=5, num_classes=2,
        embedding=RobertaEmbeddings(cfg), flash=False, num_heads=8,
        num_encoders=1, channels=3, seq_len=32).eval()

    rng = np.random.RandomState(6)
    b, lag, s = 2, 5, 16
    batch = {
        "input_ids": torch.tensor(
            rng.randint(2, 100, size=(b, lag, s)).astype(np.int64)),
        "pixels": torch.tensor(
            (rng.randn(b, lag, 3, 224, 224) * 0.5).astype(np.float32)),
        "prices": torch.tensor(rng.randn(b, lag, 5).astype(np.float32)),
        "attention_mask": torch.ones(b, lag, s),
    }
    orig_half = torch.Tensor.half
    torch.Tensor.half = lambda self: self
    try:
        with torch.no_grad():
            ref_out = ref.forward(**batch).numpy()
    finally:
        torch.Tensor.half = orig_half

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meant_timesformer
    from meant_tpu.utils import port
    params = port.import_meant_timesformer(dict(ref.state_dict()),
                                           num_encoders=1, ts_depth=1)
    model = meant_timesformer(
        text_dim=768, image_dim=768, price_dim=5, height=224, width=224,
        patch_res=16, lag=5, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=100, hidden_size=768,
                                  max_position_embeddings=40, dropout=0.0),
        num_heads=8, num_encoders=1, channels=3, seq_len=32)
    out = np.asarray(model.apply(
        {"params": params},
        input_ids=jnp.asarray(np.asarray(batch["input_ids"], np.int32)),
        pixels=jnp.asarray(np.asarray(batch["pixels"])),
        prices=jnp.asarray(np.asarray(batch["prices"])),
        attention_mask=jnp.asarray(np.asarray(batch["attention_mask"],
                                              np.float32))))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_timesformer parity violated: {diff}"


def test_true_reference_meant_mean_pooling_parity():
    _install_stubs()
    import src.meant.meant_mean_pooling as ref_mod

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(7)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0)
    ref = ref_mod.meant_mean_pooling(
        text_dim=768, image_dim=768, price_dim=5, height=224, width=224,
        patch_res=16, lag=5, num_classes=2,
        embedding=RobertaEmbeddings(cfg), flash=False, num_heads=8,
        num_encoders=1, channels=3, seq_len=32).eval()
    rng = np.random.RandomState(7)
    b, lag, s = 2, 5, 16
    batch = {
        "input_ids": torch.tensor(
            rng.randint(2, 100, size=(b, lag, s)).astype(np.int64)),
        "pixels": torch.tensor(
            (rng.randn(b, lag, 3, 224, 224) * 0.5).astype(np.float32)),
        "prices": torch.tensor(rng.randn(b, lag, 5).astype(np.float32)),
        "attention_mask": torch.ones(b, lag, s),
    }
    orig_half = torch.Tensor.half
    torch.Tensor.half = lambda self: self
    try:
        with torch.no_grad():
            ref_out = ref.forward(**batch).numpy()
    finally:
        torch.Tensor.half = orig_half

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meant_mean_pooling
    from meant_tpu.utils import port
    params = port.import_meant_mean_pooling(dict(ref.state_dict()),
                                            num_encoders=1, ts_depth=1)
    model = meant_mean_pooling(
        text_dim=768, image_dim=768, price_dim=5, height=224, width=224,
        patch_res=16, lag=5, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=100, hidden_size=768,
                                  max_position_embeddings=40, dropout=0.0),
        num_heads=8, num_encoders=1, channels=3, seq_len=32)
    out = np.asarray(model.apply(
        {"params": params},
        input_ids=jnp.asarray(np.asarray(batch["input_ids"], np.int32)),
        pixels=jnp.asarray(np.asarray(batch["pixels"])),
        prices=jnp.asarray(np.asarray(batch["prices"])),
        attention_mask=jnp.asarray(np.asarray(batch["attention_mask"],
                                              np.float32))))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_mean_pooling parity violated: {diff}"


def test_true_reference_meant_tweet_price_parity():
    _install_stubs()
    import src.meant.meant_tweet_price as ref_mod

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(8)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0)
    ref = ref_mod.meantTweetPrice(
        text_dim=768, price_dim=5, lag=5, num_classes=2,
        embedding=RobertaEmbeddings(cfg), num_heads=8,
        num_encoders=1).eval()
    rng = np.random.RandomState(8)
    b, lag, s = 2, 5, 16
    tweets = torch.tensor(rng.randint(2, 100, size=(b, lag, s))
                          .astype(np.int64))
    prices = torch.tensor(rng.randn(b, lag, 5).astype(np.float32))
    mask = torch.ones(b, lag, s)
    with torch.no_grad():
        ref_out = ref(tweets, prices, attention_mask=mask).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meantTweetPrice
    from meant_tpu.utils import port
    params = port.import_meant_tweet_price(dict(ref.state_dict()),
                                           num_encoders=1)
    model = meantTweetPrice(
        text_dim=768, price_dim=5, lag=5, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=100, hidden_size=768,
                                  max_position_embeddings=40, dropout=0.0),
        num_heads=8, num_encoders=1)
    out = np.asarray(model.apply(
        {"params": params}, jnp.asarray(np.asarray(tweets, np.int32)),
        jnp.asarray(np.asarray(prices)),
        jnp.asarray(np.asarray(mask, np.float32))))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meantTweetPrice parity violated: {diff}"


def test_true_reference_meant_tweet_parity():
    """meant_tweet with the `final_resi` NameError (`meant/meant_tweet.py:81`,
    DEFECTS #1) monkeypatched to the obvious `final_resid` — one-typo-away
    parity for the otherwise-unrunnable reference model."""
    _install_stubs()
    import importlib
    # `meant/__init__.py` rebinds the package attr `meant_tweet` to the
    # CLASS — fetch the actual submodule
    ref_mod = importlib.import_module("meant.meant_tweet")

    def patched_forward(self, input, attention_mask=None):
        inter = input
        for mod in self.encode:
            if type(mod).__name__ == 'xPosAttention':
                inter = mod(inter, attention_mask)
            else:
                inter = mod(inter)
        inter = inter + input
        final_resid = inter
        for mod in self.encode2:
            inter = mod(inter)
        return inter + final_resid  # reference line 81 typo fixed

    orig = ref_mod.languageEncoder.forward
    ref_mod.languageEncoder.forward = patched_forward
    try:
        from transformers.models.roberta.modeling_roberta import \
            RobertaEmbeddings
        from transformers import RobertaConfig
        torch.manual_seed(7)
        cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                            max_position_embeddings=40, type_vocab_size=1,
                            pad_token_id=1, hidden_dropout_prob=0.0,
                            layer_norm_eps=1e-5)
        ref = ref_mod.meant_tweet(text_dim=768, price_dim=4, lag=5,
                                  num_classes=2,
                                  embedding=RobertaEmbeddings(cfg),
                                  flash=False, num_heads=8,
                                  num_encoders=1).eval()
        rng = np.random.RandomState(7)
        b, lag, s = 2, 5, 16
        tweets = rng.randint(2, 100, size=(b, lag, s)).astype(np.int64)
        mask = np.ones((b, lag, s), np.float32)
        mask[:, :, 13:] = 0
        with torch.no_grad():
            ref_out = ref(torch.tensor(tweets), torch.tensor(mask)).numpy()
    finally:
        ref_mod.languageEncoder.forward = orig

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meant_tweet
    from meant_tpu.utils import port
    params = port.import_meant_tweet(dict(ref.state_dict()), num_encoders=1)
    model = meant_tweet(text_dim=768, price_dim=4, lag=5, num_classes=2,
                        embedding=EmbeddingConfig(
                            vocab_size=100, hidden_size=768,
                            max_position_embeddings=40, dropout=0.0),
                        num_heads=8, num_encoders=1)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(tweets.astype(np.int32)),
                                 jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_tweet reference parity violated: {diff}"


def test_true_reference_meant_price_parity():
    _install_stubs()
    from src.meant.meantPrice import meant_price as ref_model

    torch.manual_seed(8)
    ref = ref_model(price_dim=5, lag=5, num_classes=2, num_heads=8,
                    num_encoders=1).eval()
    rng = np.random.RandomState(8)
    prices = rng.randn(4, 5, 5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(prices=torch.tensor(prices)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import meant_price
    from meant_tpu.utils import port
    params = port.import_meant_price(dict(ref.state_dict()))
    model = meant_price(price_dim=5, lag=5, num_classes=2, num_heads=8)
    out = np.asarray(model.apply({"params": params},
                                 prices=jnp.asarray(prices)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"meant_price reference parity violated: {diff}"


def test_true_reference_temporal2_parity():
    """temporal_2 (`src/meant/temporal_new.py:7-69`) vs TemporalAttention2
    at ported weights, with a padding mask."""
    _install_stubs()
    from src.meant.temporal_new import temporal_2 as ref_cls

    torch.manual_seed(9)
    b, lag, s, d, h = 2, 5, 8, 32, 4
    ref = ref_cls(num_heads=h, dim=d, sequence_length=s, lag=lag).eval()
    rng = np.random.RandomState(9)
    x = rng.randn(b, lag, s, d).astype(np.float32)
    mask = np.ones((b, lag, s), np.float32)
    mask[0, :, 6:] = 0
    with torch.no_grad():
        ref_out = ref(torch.tensor(x),
                      attention_mask=torch.tensor(mask)).numpy()

    import jax.numpy as jnp
    from meant_tpu.nn.attention_modules import TemporalAttention2
    from meant_tpu.utils import port
    params = port.import_temporal2(dict(ref.state_dict()))
    mod = TemporalAttention2(num_heads=h, dim=d, lag=lag,
                             sequence_length=s)
    out = np.asarray(mod.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"temporal_2 reference parity violated: {diff}"


def test_true_reference_mlp_encoder_parity():
    _install_stubs()
    from src.meant.simple_mlp import mlpEncoder as ref_cls

    torch.manual_seed(10)
    ref = ref_cls(input_dim=5, output_dim=2, hidden_dim=16).eval()
    rng = np.random.RandomState(10)
    prices = rng.randn(4, 5, 5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(prices=torch.tensor(prices)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import mlpEncoder
    from meant_tpu.utils import port
    params = port.import_mlp_encoder(dict(ref.state_dict()))
    model = mlpEncoder(input_dim=5, output_dim=2, hidden_dim=16)
    out = np.asarray(model.apply({"params": params},
                                 prices=jnp.asarray(prices)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"mlpEncoder reference parity violated: {diff}"


def test_true_reference_lstm_encoder_parity():
    """LSTMEncoder incl. the reference's batch-axis-as-time quirk
    (`src/meant/simple_mlp.py:39,46`: (b, lag, h) into nn.LSTM without
    batch_first)."""
    _install_stubs()
    from src.meant.simple_mlp import LSTMEncoder as ref_cls

    torch.manual_seed(11)
    ref = ref_cls(input_dim=5, output_dim=2, hidden_dim=16).eval()
    rng = np.random.RandomState(11)
    prices = rng.randn(4, 5, 5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(prices=torch.tensor(prices)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import LSTMEncoder
    from meant_tpu.utils import port
    params = port.import_lstm_encoder(dict(ref.state_dict()))
    model = LSTMEncoder(input_dim=5, output_dim=2, hidden_dim=16)
    out = np.asarray(model.apply({"params": params},
                                 prices=jnp.asarray(prices)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"LSTMEncoder reference parity violated: {diff}"


def test_true_reference_meant12_full_geometry_parity():
    """Depth-12, FULL-geometry meant (s=128, 224x224, 8 heads, dim 768) —
    the MEANT-12 configuration of BASELINE.json, checking depth-accumulated
    drift that the depth-1 tiny-shape tests cannot see."""
    _install_stubs()
    from meant.meant import meant as ref_meant

    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from transformers import RobertaConfig
    torch.manual_seed(12)
    cfg = RobertaConfig(vocab_size=200, hidden_size=768,
                        max_position_embeddings=140, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    ref = ref_meant(text_dim=768, image_dim=768, price_dim=4, height=224,
                    width=224, patch_res=16, lag=5, num_classes=2,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=8, num_encoders=12, channels=4).eval()

    rng = np.random.RandomState(12)
    b, lag, s = 1, 5, 128
    tweets = rng.randint(2, 200, size=(b, lag, s)).astype(np.int64)
    tweets[:, :, 100:] = 1
    mask = np.ones((b, lag, s), np.float32)
    mask[:, :, 100:] = 0
    images = (rng.randn(b, lag, 4, 224, 224) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(tweets), torch.tensor(images),
                      torch.tensor(mask)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig, meant as tpu_meant
    from meant_tpu.utils import port
    params = port.import_meant(dict(ref.state_dict()), num_encoders=12)
    model = tpu_meant(text_dim=768, image_dim=768, price_dim=4, height=224,
                      width=224, patch_res=16, lag=5, num_classes=2,
                      embedding=EmbeddingConfig(
                          vocab_size=200, hidden_size=768,
                          max_position_embeddings=140, dropout=0.0),
                      num_heads=8, num_encoders=12, channels=4)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(tweets.astype(np.int32)),
                                 jnp.asarray(images), jnp.asarray(mask)))
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"MEANT-12 full-geometry parity violated: {diff}"


def _stub_pretrain_datasets():
    """pretrain_mlm/pretrain_mim import `mlm_dataset`/`mim_dataset` from the
    reference `utils` package at module top (unused by the model classes);
    the real custom_datasets.py needs the absent `emoji` package, so the
    names are satisfied on the stub instead."""
    _install_stubs()
    stub = sys.modules["utils"]
    for name in ("mlm_dataset", "mim_dataset"):
        if not hasattr(stub, name):
            setattr(stub, name, None)


def test_true_reference_language_pretrainer_parity():
    """ASSEMBLED MLM pretrainer (`pretrain_mlm.py:74-88` +
    `:317-320`: bertweet RobertaEmbeddings in, bertweet RobertaLMHead out,
    paper-generation languageEncoders between) vs
    models/pretrainers.meant_language_pretrainer at ported weights."""
    _stub_pretrain_datasets()
    from pretrain_mlm import meant_language_pretrainer as ref_pre
    from transformers import RobertaConfig, RobertaForMaskedLM

    torch.manual_seed(3)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        num_hidden_layers=1, num_attention_heads=8,
                        intermediate_size=64, layer_norm_eps=1e-5)
    bertweet = RobertaForMaskedLM(cfg)
    ref = ref_pre(2, 768, bertweet.roberta.embeddings,
                  bertweet.lm_head).eval()

    rng = np.random.RandomState(3)
    b, s = 2, 16
    ids = rng.randint(2, 100, size=(b, s)).astype(np.int64)
    ids[:, 12:] = 1
    mask = np.ones((b, s), np.float32)
    mask[:, 12:] = 0
    with torch.no_grad():
        ref_out = ref(torch.tensor(ids), torch.tensor(mask)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.pretrainers import meant_language_pretrainer
    from meant_tpu.utils import port

    params = port.import_language_pretrainer(dict(ref.state_dict()), 2)
    model = meant_language_pretrainer(
        num_encoders=2,
        embedding=EmbeddingConfig(vocab_size=100, hidden_size=768,
                                  max_position_embeddings=40, dropout=0.0),
        text_dim=768, num_heads=8)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(ids.astype(np.int32)),
                                 jnp.asarray(mask)))
    assert out.shape == ref_out.shape == (b, s, 100)
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"MLM pretrainer reference parity violated: {diff}"


def test_true_reference_vision_pretrainer_parity():
    """ASSEMBLED MIM pretrainer (`pretrain_mim.py:77-99` + `:337-339`: the
    HF ViTForMaskedImageModeling decoder grafted behind one visionEncoder)
    vs models/pretrainers.meant_vision_pretrainer at ported weights. Also
    pins DEFECTS #29: the torch __init__ ignores num_encoders."""
    _stub_pretrain_datasets()
    from pretrain_mim import meant_vision_pretrainer as ref_pre
    from transformers import ViTConfig, ViTForMaskedImageModeling

    torch.manual_seed(4)
    vcfg = ViTConfig(hidden_size=768, num_hidden_layers=1,
                     num_attention_heads=8, intermediate_size=64,
                     image_size=64, patch_size=16, encoder_stride=16)
    vit = ViTForMaskedImageModeling(vcfg)
    ref = ref_pre(3, vit.decoder, 768, patch_res=16, channels=4,
                  height=64, width=64).eval()
    # DEFECTS #29: depth 3 requested, exactly ONE encoder built
    assert len(ref.visionEncoders) == 1

    rng = np.random.RandomState(4)
    imgs = (rng.randn(2, 4, 64, 64) * 0.5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(imgs)).numpy()

    import jax.numpy as jnp
    from meant_tpu.models.pretrainers import meant_vision_pretrainer
    from meant_tpu.utils import port

    params = port.import_vision_pretrainer(dict(ref.state_dict()), 1)
    model = meant_vision_pretrainer(num_encoders=1, patch_res=16,
                                    channels=4, height=64, width=64,
                                    image_dim=768, num_heads=8)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(imgs)))
    assert out.shape == ref_out.shape == (2, 3, 64, 64)
    diff = np.abs(out - ref_out).max()
    assert diff <= 1e-3, f"MIM pretrainer reference parity violated: {diff}"
