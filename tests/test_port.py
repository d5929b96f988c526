"""Torch-weight importer tests: reference state_dict naming -> flax tree,
including the q/v/k projection swap."""

import numpy as np
import pytest

import jax

from meant_tpu.models import EmbeddingConfig, meant
from meant_tpu.utils import port


def _lin(rng, i, o):
    return {"weight": rng.randn(o, i).astype(np.float32),
            "bias": rng.randn(o).astype(np.float32)}


def synthetic_reference_sd(num_encoders=1, dim=32, vocab=50, lag=5,
                           patch_dim=4 * 16 * 16, n_classes=2, seed=0):
    """A state_dict with the reference's exact key naming
    (`meant/meant.py` module tree)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def put_lin(prefix, i, o):
        L = _lin(rng, i, o)
        sd[f"{prefix}.weight"] = L["weight"]
        sd[f"{prefix}.bias"] = L["bias"]

    # embeddings (HF naming nested under embedding.0)
    sd["embedding.0.word_embeddings.weight"] = rng.randn(vocab, dim).astype(np.float32)
    sd["embedding.0.position_embeddings.weight"] = rng.randn(40, dim).astype(np.float32)
    sd["embedding.0.token_type_embeddings.weight"] = rng.randn(1, dim).astype(np.float32)
    sd["embedding.0.LayerNorm.weight"] = np.ones(dim, np.float32)
    sd["embedding.0.LayerNorm.bias"] = np.zeros(dim, np.float32)
    sd["patchEmbed.1.weight"] = rng.randn(dim, patch_dim).astype(np.float32)
    sd["patchEmbed.1.bias"] = rng.randn(dim).astype(np.float32)

    for fam, xpos_name in (("languageEncoders", "xPos"),
                           ("visionEncoders", "posEmbed")):
        for i in range(num_encoders):
            pre = f"{fam}.{i}"
            # real torch registers the shared rotary module TWICE: at the
            # encoder level and inside the attention module
            freqs = rng.rand(2).astype(np.float32)
            sd[f"{pre}.{xpos_name}.freqs"] = freqs
            inner = "xPos" if fam == "languageEncoders" else "pos_emb"
            sd[f"{pre}.encode.2.{inner}.freqs"] = freqs
            for blk, idxs in (("encode", (0, 1, 3)), ("encode2", (0, 1, 3))):
                sd[f"{pre}.{blk}.{idxs[0]}.scale"] = rng.randn(dim).astype(np.float32)
                put_lin(f"{pre}.{blk}.{idxs[1]}", dim, dim)
                sd[f"{pre}.{blk}.{idxs[2]}.scale"] = rng.randn(dim).astype(np.float32)
            # language encode has dropout at index 4 => proj_out at 5;
            # encode2 has dropout at 4 => ff_out at 5 (use 5 for language)
            out_idx = 5 if fam == "languageEncoders" else 4
            put_lin(f"{pre}.encode.{out_idx}", dim, dim)
            put_lin(f"{pre}.encode2.{5 if fam == 'languageEncoders' else 4}",
                    dim, dim)
            for proj in ("q", "k", "v", "multi_mad"):
                put_lin(f"{pre}.encode.2.{proj}", dim, dim)

    pre = "temporal_encoding.0"
    fused = 2 * dim
    sd[f"{pre}.temp_embedding"] = rng.randn(1, lag, fused).astype(np.float32)
    sd[f"{pre}.temp_encode.0.scale"] = rng.randn(fused).astype(np.float32)
    put_lin(f"{pre}.temp_encode.1", fused, fused)
    for proj in ("q", "k", "v", "multi_mad"):
        put_lin(f"{pre}.temp_encode.2.{proj}", fused, fused)
    sd[f"{pre}.temp_encode.3.scale"] = rng.randn(fused).astype(np.float32)
    put_lin(f"{pre}.temp_encode.4", fused, fused)
    sd["mlpHead.0.scale"] = rng.randn(fused).astype(np.float32)
    put_lin("mlpHead.1", fused, n_classes)
    return sd


def test_qvk_swap_mapping():
    sd = synthetic_reference_sd()
    enc = port.encoder_params(sd, "languageEncoders.0", norm="rms",
                              xpos_prefix="languageEncoders.0.encode.2.xPos")
    # flax k comes from reference v (and vice versa)
    np.testing.assert_array_equal(
        enc["attn"]["k"]["dense"]["kernel"],
        sd["languageEncoders.0.encode.2.v.weight"].T)
    np.testing.assert_array_equal(
        enc["attn"]["v"]["dense"]["kernel"],
        sd["languageEncoders.0.encode.2.k.weight"].T)
    np.testing.assert_array_equal(enc["attn"]["freqs"],
                                  sd["languageEncoders.0.xPos.freqs"])


def test_import_meant_matches_model_tree():
    dim = 32
    emb = EmbeddingConfig(vocab_size=50, hidden_size=dim,
                          max_position_embeddings=40, dropout=0.0)
    model = meant(text_dim=dim, image_dim=dim, price_dim=4, height=32,
                  width=32, patch_res=16, lag=5, num_classes=2,
                  embedding=emb, num_heads=4, num_encoders=1)
    import jax.numpy as jnp
    tweets = jnp.ones((1, 5, 8), jnp.int32)
    images = jnp.ones((1, 5, 4, 32, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), tweets, images)
    target = variables["params"]

    sd = synthetic_reference_sd(num_encoders=1, dim=dim)
    imported = port.import_meant(sd, num_encoders=1)

    # every leaf in the model tree must be present with matching shape,
    # except rotary freq tables whose default width may differ from the
    # synthetic 2-entry tables
    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_i = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    missing = []
    for path, leaf in flat_t:
        if path not in flat_i:
            missing.append(jax.tree_util.keystr(path))
            continue
        if "freqs" in jax.tree_util.keystr(path):
            continue
        assert flat_i[path].shape == leaf.shape, jax.tree_util.keystr(path)
    assert not missing, f"importer missed: {missing}"
    # model applies with the imported tree (freqs widths from sd)
    sd2 = synthetic_reference_sd(num_encoders=1, dim=dim)
    for k in list(sd2):
        # match the model's default table widths: language rot_dim
        # min(48, dh=8) => 4 freqs; vision rot_param (dh)//2=4 => 2 freqs
        if "xPos.freqs" in k:
            sd2[k] = np.random.RandomState(1).rand(4).astype(np.float32)
        if "posEmbed.freqs" in k or "pos_emb.freqs" in k:
            sd2[k] = np.random.RandomState(2).rand(2).astype(np.float32)
    imported2 = port.import_meant(sd2, num_encoders=1)
    out = model.apply({"params": imported2}, tweets, images)
    assert out.shape == (1, 2)


def test_export_meant_round_trip():
    """flax -> torch reverse port: import_meant(sd) -> export_meant must
    reproduce every tensor of the original reference state_dict (naming
    swap and ModuleList indices inverted exactly)."""
    import os
    import numpy as np
    import pytest
    if not os.path.isdir("/root/reference/meant"):
        pytest.skip("reference snapshot not mounted")
    import torch
    from test_reference_parity import _install_stubs
    _install_stubs()
    from meant.meant import meant as ref_meant
    from transformers import RobertaConfig
    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings
    from meant_tpu.utils import port

    torch.manual_seed(40)
    cfg = RobertaConfig(vocab_size=64, hidden_size=32,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0)
    ref = ref_meant(text_dim=32, image_dim=32, price_dim=4, height=32,
                    width=32, patch_res=16, lag=5, num_classes=2,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=4, num_encoders=2, channels=4)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = port.import_meant(sd, num_encoders=2)
    back = port.export_meant(params, num_encoders=2)
    # position_ids buffers etc. are non-parameters the exporter skips
    missing = set(sd) - set(back) - {
        k for k in sd if k.endswith("position_ids")}
    assert not missing, f"exporter dropped keys: {sorted(missing)[:5]}"
    for k, v in back.items():
        np.testing.assert_allclose(v, sd[k], rtol=0, atol=0,
                                   err_msg=k)
