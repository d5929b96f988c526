"""HF import path END-TO-END against a synthetic local cache (VERDICT r4
missing #2 / next #6): real file layouts (hub directory structure with
refs/main + snapshots, SHARDED model.safetensors with an index, and a
pytorch_model.bin), parsed by utils/hf_cache and grafted through the true
CLI flow — so real caches work first try if they ever land.

Reference flow being rehearsed: `in_loop_train.py:440-507`
(AutoModel.from_pretrained bertweet -> embeddings into meant-family
models / full backbones for the HF wrappers, word embeddings swapped for
bertweet's)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors_torch = pytest.importorskip("safetensors.torch")

# tiny bertweet-shaped geometry (the CLI exposes every dimension, so the
# fake checkpoint and the built model agree without 500 MB test artifacts)
VOCAB, HIDDEN, LAYERS, HEADS, MAXPOS = 100, 32, 2, 4, 130
# MAXPOS 130 = the real bertweet value (the wrapper's RobertaModel default)


def _roberta_sd_and_cfg(seed=0):
    from transformers import RobertaConfig, RobertaModel
    torch.manual_seed(seed)
    cfg = RobertaConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=4 * HIDDEN,
        max_position_embeddings=MAXPOS, type_vocab_size=1, pad_token_id=1)
    return RobertaModel(cfg).state_dict(), cfg.to_dict()


def _write_hub_cache(root, repo_id, sd, config, fmt="safetensors",
                     shards=1):
    """Write a real hub-layout cache: models--org--name/refs/main +
    snapshots/<rev>/{config.json, weights}."""
    rev = "deadbeefcafe"
    mdir = os.path.join(root, "models--" + repo_id.replace("/", "--"))
    snap = os.path.join(mdir, "snapshots", rev)
    os.makedirs(snap, exist_ok=True)
    os.makedirs(os.path.join(mdir, "refs"), exist_ok=True)
    with open(os.path.join(mdir, "refs", "main"), "w") as f:
        f.write(rev)
    with open(os.path.join(snap, "config.json"), "w") as f:
        json.dump(config, f)
    sd = {k: v.contiguous() for k, v in sd.items()}
    if fmt == "bin":
        torch.save(sd, os.path.join(snap, "pytorch_model.bin"))
    elif shards == 1:
        safetensors_torch.save_file(
            sd, os.path.join(snap, "model.safetensors"))
    else:
        keys = sorted(sd)
        per = (len(keys) + shards - 1) // shards
        weight_map = {}
        for i in range(shards):
            part = {k: sd[k] for k in keys[i * per:(i + 1) * per]}
            fname = f"model-{i + 1:05d}-of-{shards:05d}.safetensors"
            safetensors_torch.save_file(part, os.path.join(snap, fname))
            weight_map.update({k: fname for k in part})
        with open(os.path.join(snap, "model.safetensors.index.json"),
                  "w") as f:
            json.dump({"weight_map": weight_map}, f)
    return snap


@pytest.fixture()
def bertweet_cache(tmp_path):
    sd, cfg = _roberta_sd_and_cfg()
    # SHARDED safetensors — exercises the index-merge path
    _write_hub_cache(str(tmp_path), "vinai/bertweet-base", sd, cfg,
                     shards=3)
    return str(tmp_path), sd


class TestCacheReader:
    def test_resolve_refs_main_and_sharded_load(self, bertweet_cache):
        from meant_tpu.utils.hf_cache import load_pretrained
        root, sd = bertweet_cache
        cfg, got = load_pretrained("vinai/bertweet-base", cache_dir=root)
        assert cfg["num_attention_heads"] == HEADS
        assert set(got) == set(sd)
        np.testing.assert_array_equal(
            got["embeddings.word_embeddings.weight"].numpy(),
            sd["embeddings.word_embeddings.weight"].numpy())

    def test_bin_roundtrip_and_plain_dir(self, tmp_path):
        from meant_tpu.utils.hf_cache import load_pretrained
        sd, cfg = _roberta_sd_and_cfg(seed=1)
        snap = _write_hub_cache(str(tmp_path), "x/y", sd, cfg, fmt="bin")
        _, got = load_pretrained(snap)   # plain-directory resolution
        assert set(got) == set(sd)

    def test_missing_cache_is_loud(self, tmp_path):
        from meant_tpu.utils.hf_cache import resolve_snapshot
        with pytest.raises(FileNotFoundError, match="no local cache"):
            resolve_snapshot("nope/never-downloaded", str(tmp_path))


def _cli_args(model_name, root, extra=()):
    return ["-rid", "hfcache_test", "--model_name", model_name,
            "--hf_cache", root, "--num_encoders", str(LAYERS),
            "--num_heads", str(HEADS), "--text_dim", str(HIDDEN),
            "--image_dim", str(HIDDEN), "--vocab_size", str(VOCAB),
            "--synthetic_n", "64", "--seq_len", "8", "--image_size", "32",
            "--train_batch_size", "8", "--num_epochs", "1",
            "--learning_rate", "1e-4", "--bf16", "false",
            "--flash", "false", "--test_model", "false", *extra]


class TestEndToEndCLI:
    def test_bertweet_wrapper_trains_from_cache(self, bertweet_cache,
                                                capsys):
        """The FULL cache -> port -> graft -> train path of
        cli/in_loop_train (reference `in_loop_train.py:440,473-475`)."""
        from meant_tpu.cli.in_loop_train import main
        root, sd = bertweet_cache
        main(_cli_args("bertweet", root))
        assert "initialized bertweet from local HF cache" in \
            capsys.readouterr().out

    def test_meant_family_embedding_graft(self, bertweet_cache):
        """meant-family flow (`:496`: embedding = bertweet.embeddings): the
        grafted params carry the checkpoint's embedding table exactly."""
        from meant_tpu.utils.hf_cache import hf_graft
        root, sd = bertweet_cache
        params = {"embedding": {"word_embeddings": np.zeros((VOCAB, HIDDEN),
                                                            np.float32)},
                  "other": {"w": np.ones(3, np.float32)}}
        out = hf_graft("meant_tweet", params, LAYERS, cache_dir=root)
        np.testing.assert_array_equal(
            np.asarray(out["embedding"]["word_embeddings"]),
            sd["embeddings.word_embeddings.weight"].numpy())
        assert out["other"] is params["other"]   # untouched subtrees stay

    def test_vilt_import_with_bertweet_word_swap(self, bertweet_cache,
                                                 tmp_path):
        """ViLT flow (`:465-466`): checkpoint imports from a
        pytorch_model.bin cache, then the word-embedding table is
        bertweet's (the reference swaps the module, changing the vocab)."""
        from transformers import ViltConfig
        from transformers.models.vilt.modeling_vilt import ViltModel
        torch.manual_seed(2)
        vcfg = ViltConfig(
            vocab_size=50, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, intermediate_size=4 * HIDDEN,
            max_position_embeddings=16, type_vocab_size=2,
            modality_type_vocab_size=2, image_size=64, patch_size=16,
            num_channels=3, max_image_length=-1)
        vm = ViltModel(vcfg)
        root, bsd = bertweet_cache
        _write_hub_cache(root, "dandelin/vilt-b32-mlm", vm.state_dict(),
                         vcfg.to_dict(), fmt="bin")

        from meant_tpu.utils.hf_cache import hf_graft
        out = hf_graft("vilt", {}, LAYERS, cache_dir=root)
        te = out["vilt"]["text_embeddings"]
        np.testing.assert_array_equal(
            np.asarray(te["word_embeddings"]),
            bsd["embeddings.word_embeddings.weight"].numpy())  # 100-vocab
        np.testing.assert_array_equal(
            np.asarray(te["position_embeddings"]),
            vm.state_dict()[
                "embeddings.text_embeddings.position_embeddings.weight"]
            .numpy())
        assert f"layer_{LAYERS - 1}" in out["vilt"]
