"""Torch → flax weight porting.

Maps reference state_dicts onto meant_tpu param trees so pretrained weights
(HF bertweet embeddings, trained MEANT checkpoints) carry over and the 1e-3
logit-parity target holds with real weights.

Key mapping rules:
  * torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose.
  * PROJECTION-NAMING QUIRK: the reference assigns ``(q(x), v(x), k(x))`` to
    ``q_mat, k_mat, v_mat`` (`meant/xPosAttention.py:37-38`,
    `meant/attention.py:37-38`, `meant/temporal.py:38-39`), i.e. its "v"
    Linear computes KEYS and its "k" Linear computes VALUES. This importer
    therefore maps reference `v.*` -> flax `k` and `k.*` -> flax `v` for
    those modules. The src-era temporal (`src/meant/temporal.py:44-46`) uses
    the straight order — `swap_kv=False` for it.
  * encode/encode2 ModuleList indices -> named flax submodules:
      encode[0]=norm1, encode[1]=proj_in, encode[2]=attn,
      encode[3]=norm2, encode[-1]=proj_out,
      encode2[0]=norm3, encode2[1]=ff_in, encode2[3]=norm4,
      encode2[-1]=ff_out  (`meant/meant.py:57-64,100-107`).
  * rotary freq tables: RotaryEmbedding.freqs -> attn/freqs (exact fp32
    values carried — required for bit-tight angle parity).
  * HF RobertaEmbeddings -> RobertaEmbeddings param names.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    try:
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def linear_params(sd: Mapping, prefix: str) -> Dict:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return {"dense": out}


def norm_params(sd: Mapping, prefix: str, kind: str) -> Dict:
    if kind == "rms":
        out = {"scale": _t(sd[f"{prefix}.scale"])}
        if f"{prefix}.offset" in sd:
            out["offset"] = _t(sd[f"{prefix}.offset"])
        return out
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "offset": _t(sd[f"{prefix}.bias"])}


def attention_params(sd: Mapping, prefix: str, swap_kv: bool = True,
                     freqs_key: str = None) -> Dict:
    """q/k/v/multi_mad of an xPosAttention / attention / temporal module."""
    k_src = "v" if swap_kv else "k"
    v_src = "k" if swap_kv else "v"
    out = {
        "q": linear_params(sd, f"{prefix}.q"),
        "k": linear_params(sd, f"{prefix}.{k_src}"),
        "v": linear_params(sd, f"{prefix}.{v_src}"),
        "multi_mad": linear_params(sd, f"{prefix}.multi_mad"),
    }
    if freqs_key and freqs_key in sd:
        out["freqs"] = _t(sd[freqs_key])
    return out


def encoder_params(sd: Mapping, prefix: str, norm: str = "rms",
                   ff_norm2: str = None, xpos_prefix: str = None) -> Dict:
    """One languageEncoder/visionEncoder.
    encode indices with dropout present shift proj_out to encode[5]
    (`meant/meant.py:100-107`); both 5- and 6-element layouts are handled by
    probing which index holds the final Linear."""
    ff_norm2 = ff_norm2 or norm

    def maybe_linear(i):
        return f"{prefix}.encode.{i}.weight" in sd

    proj_out_idx = 5 if maybe_linear(5) else 4
    ff_out_idx = 5 if f"{prefix}.encode2.5.weight" in sd else 4
    freqs_key = (f"{xpos_prefix}.freqs" if xpos_prefix else None)
    return {
        "norm1": norm_params(sd, f"{prefix}.encode.0", norm),
        "proj_in": linear_params(sd, f"{prefix}.encode.1"),
        "attn": attention_params(sd, f"{prefix}.encode.2", swap_kv=True,
                                 freqs_key=freqs_key),
        "norm2": norm_params(sd, f"{prefix}.encode.3", norm),
        "proj_out": linear_params(sd, f"{prefix}.encode.{proj_out_idx}"),
        "norm3": norm_params(sd, f"{prefix}.encode2.0", norm),
        "ff_in": linear_params(sd, f"{prefix}.encode2.1"),
        "norm4": norm_params(sd, f"{prefix}.encode2.3", ff_norm2),
        "ff_out": linear_params(sd, f"{prefix}.encode2.{ff_out_idx}"),
    }


def roberta_embedding_params(sd: Mapping, prefix: str = "") -> Dict:
    """HF RobertaEmbeddings state_dict -> RobertaEmbeddings params.
    Accepts prefixes like 'embeddings.' or 'embedding.0.'."""
    p = prefix
    return {
        "word_embeddings": _t(sd[f"{p}word_embeddings.weight"]),
        "position_embeddings": _t(sd[f"{p}position_embeddings.weight"]),
        "token_type_embeddings": _t(sd[f"{p}token_type_embeddings.weight"]),
        "ln_scale": _t(sd[f"{p}LayerNorm.weight"]),
        "ln_bias": _t(sd[f"{p}LayerNorm.bias"]),
    }


def lm_head_params(sd: Mapping, prefix: str = "lm_head.") -> Dict:
    """HF RobertaLMHead -> RobertaLMHead params."""
    p = prefix
    return {
        "dense": linear_params(sd, f"{p}dense"),
        "norm": {"scale": _t(sd[f"{p}layer_norm.weight"]),
                 "offset": _t(sd[f"{p}layer_norm.bias"])},
        "decoder": linear_params(sd, f"{p}decoder"),
    }


def import_meant(sd: Mapping, num_encoders: int) -> Dict:
    """Full paper-generation `meant` state_dict -> params['params'] tree."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "patchEmbed": linear_params(sd, "patchEmbed.1"),
        "temporal_encoding_0": {
            "temp_embedding": _t(sd["temporal_encoding.0.temp_embedding"]),
            "norm1": norm_params(sd, "temporal_encoding.0.temp_encode.0",
                                 "rms"),
            "proj_in": linear_params(sd, "temporal_encoding.0.temp_encode.1"),
            "temporal": attention_params(
                sd, "temporal_encoding.0.temp_encode.2", swap_kv=True),
            "norm2": norm_params(sd, "temporal_encoding.0.temp_encode.3",
                                 "rms"),
            "proj_out": linear_params(sd,
                                      "temporal_encoding.0.temp_encode.4"),
        },
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "rms"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        # the rotary tables live INSIDE the attention module
        # (`encode.2.xPos.freqs` / `encode.2.pos_emb.freqs`); deterministic
        # init makes them identical either way, but carry them exactly
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="rms",
            xpos_prefix=f"languageEncoders.{i}.encode.2.xPos")
        params[f"visionEncoders_{i}"] = encoder_params(
            sd, f"visionEncoders.{i}", norm="rms",
            xpos_prefix=f"visionEncoders.{i}.encode.2.pos_emb")
    return params


def roberta_layer_params(sd: Mapping, prefix: str, num_heads: int) -> Dict:
    """HF RobertaLayer state_dict -> meant_tpu.nn.roberta.RobertaLayer params
    (flax MultiHeadDotProductAttention keeps per-head kernels
    (d, heads, head_dim); HF stores (d, d))."""
    def mha_proj(name):
        w = _t(sd[f"{prefix}.attention.self.{name}.weight"]).T  # (d, d)
        b = _t(sd[f"{prefix}.attention.self.{name}.bias"])
        d = w.shape[0]
        dh = d // num_heads
        return {"kernel": w.reshape(d, num_heads, dh),
                "bias": b.reshape(num_heads, dh)}

    d = _t(sd[f"{prefix}.attention.output.dense.weight"]).shape[0]
    dh = d // num_heads
    out_w = _t(sd[f"{prefix}.attention.output.dense.weight"]).T  # (d, d)
    return {
        "attention": {
            "query": mha_proj("query"),
            "key": mha_proj("key"),
            "value": mha_proj("value"),
            "out": {"kernel": out_w.reshape(num_heads, dh, d),
                    "bias": _t(sd[f"{prefix}.attention.output.dense.bias"])},
        },
        "attention_norm": {
            "scale": _t(sd[f"{prefix}.attention.output.LayerNorm.weight"]),
            "bias": _t(sd[f"{prefix}.attention.output.LayerNorm.bias"]),
        },
        "intermediate": {
            "kernel": _t(sd[f"{prefix}.intermediate.dense.weight"]).T,
            "bias": _t(sd[f"{prefix}.intermediate.dense.bias"]),
        },
        "output": {
            "kernel": _t(sd[f"{prefix}.output.dense.weight"]).T,
            "bias": _t(sd[f"{prefix}.output.dense.bias"]),
        },
        "output_norm": {
            "scale": _t(sd[f"{prefix}.output.LayerNorm.weight"]),
            "bias": _t(sd[f"{prefix}.output.LayerNorm.bias"]),
        },
    }


def import_hf_roberta(sd: Mapping, num_layers: int, num_heads: int = 12,
                      prefix: str = "roberta.") -> Dict:
    """Full HF RobertaModel state_dict -> meant_tpu RobertaModel params
    (embeddings + layers + pooler). `sd` may come from torch.load of a
    pytorch_model.bin or a safetensors file read into a dict."""
    p = prefix
    params = {"embeddings": roberta_embedding_params(sd, f"{p}embeddings.")}
    for i in range(num_layers):
        params[f"layer_{i}"] = roberta_layer_params(
            sd, f"{p}encoder.layer.{i}", num_heads)
    if f"{p}pooler.dense.weight" in sd:
        params["pooler"] = {
            "kernel": _t(sd[f"{p}pooler.dense.weight"]).T,
            "bias": _t(sd[f"{p}pooler.dense.bias"]),
        }
    return params


def _slim_temporal_params(sd: Mapping, prefix: str) -> Dict:
    """slim temporalEncoder (`meant/meant_vision.py:81-106`): temp_embedding +
    [Linear, temporal, Linear] (norms commented out => indices 0,1,2)."""
    return {
        "temp_embedding": _t(sd[f"{prefix}.temp_embedding"]),
        "proj_in": linear_params(sd, f"{prefix}.temp_encode.0"),
        "temporal": attention_params(sd, f"{prefix}.temp_encode.1",
                                     swap_kv=True),
        "proj_out": linear_params(sd, f"{prefix}.temp_encode.2"),
    }


def import_meant_vision(sd: Mapping, num_encoders: int) -> Dict:
    """`meant/meant_vision.py` state_dict -> meant_vision params."""
    params = {
        "patchEmbed": linear_params(sd, "patchEmbed.1"),
        "temporal_encoding_0": _slim_temporal_params(sd,
                                                     "temporal_encoding.0"),
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"visionEncoders_{i}"] = encoder_params(
            sd, f"visionEncoders.{i}", norm="rms",
            xpos_prefix=f"visionEncoders.{i}.posEmbed")
    return params


def import_language_pretrainer(sd: Mapping, num_encoders: int,
                               tie: bool = True) -> Dict:
    """`pretrain_mlm.py:74-88` meant_language_pretrainer state_dict ->
    meant_language_pretrainer params: RobertaEmbeddings (`embedding.0.`),
    paper-generation languageEncoders, bertweet RobertaLMHead
    (`mlm_head.`). `tie=True` (the RobertaForMaskedLM default the reference
    assembles from) carries only the decoder BIAS — the decoder weight IS
    the word-embedding table on both sides."""
    if tie:
        head = {
            "dense": linear_params(sd, "mlm_head.dense"),
            "norm": {"scale": _t(sd["mlm_head.layer_norm.weight"]),
                     "offset": _t(sd["mlm_head.layer_norm.bias"])},
            "decoder_bias": _t(sd["mlm_head.decoder.bias"]),
        }
    else:
        head = lm_head_params(sd, "mlm_head.")
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "mlm_head": head,
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="rms",
            xpos_prefix=f"languageEncoders.{i}.encode.2.xPos")
    return params


def import_vision_pretrainer(sd: Mapping, num_encoders: int) -> Dict:
    """`pretrain_mim.py:77-99` meant_vision_pretrainer state_dict ->
    meant_vision_pretrainer params. The torch decoder is the ViT-MIM
    `Sequential(Conv2d(hidden, r²·3, kernel_size=1), PixelShuffle(r))`
    grafted in at `pretrain_mim.py:339`; its 1x1 conv maps onto our
    per-position Linear. NOTE DEFECTS #29: the torch __init__ builds ONE
    visionEncoder regardless of num_encoders — a checkpoint can only ever
    hold depth 1; pass the depth the checkpoint actually contains."""
    conv_w = _t(sd["decoder.0.weight"])        # (out, in, 1, 1)
    params = {
        "patchEmbed": linear_params(sd, "patchEmbed.1"),
        "decoder": {"dense": {"kernel": conv_w[:, :, 0, 0].T,
                              "bias": _t(sd["decoder.0.bias"])}},
    }
    for i in range(num_encoders):
        params[f"visionEncoders_{i}"] = encoder_params(
            sd, f"visionEncoders.{i}", norm="rms",
            xpos_prefix=f"visionEncoders.{i}.encode.2.pos_emb")
    return params


def import_meant_tweet_no_lag(sd: Mapping, num_encoders: int) -> Dict:
    """`meant/meant_tweet_no_lag.py` state_dict -> meant_tweet_no_lag params
    (LayerNorm encoder generation, cls token, LayerNorm head)."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "txt_classtkn": _t(sd["txt_classtkn"]).reshape(1, 1, -1),
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="layer",
            xpos_prefix=f"languageEncoders.{i}.xPos")
    return params


def _seq_projection_params(sd: Mapping, prefix: str) -> Dict:
    """lang_proj/image_proj Sequential(Linear, LayerNorm(1), GELU)
    (`src/meant/meant.py:250-259`)."""
    return {
        "proj": linear_params(sd, f"{prefix}.0"),
        "norm": {"scale": _t(sd[f"{prefix}.1.weight"]),
                 "offset": _t(sd[f"{prefix}.1.bias"])},
    }


def import_meant_src(sd: Mapping, num_encoders: int) -> Dict:
    """src-era `meant` (`src/meant/meant.py:197-311`) state_dict ->
    meant_src params. LayerNorm encoders with RMSNorm ff-norm2; the src
    temporal uses the STRAIGHT q/k/v order (`src/meant/temporal.py:44-46` —
    no swap) and separate projections."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "patchEmbed": linear_params(sd, "patchEmbed.1"),
        "lang_proj": _seq_projection_params(sd, "lang_proj"),
        "image_proj": _seq_projection_params(sd, "image_proj"),
        "temporal_encoding_0": {
            "norm1": norm_params(sd, "temporal_encoding.0.temp_encode.0",
                                 "layer"),
            "proj_in": linear_params(sd,
                                     "temporal_encoding.0.temp_encode.1"),
            "temporal": attention_params(
                sd, "temporal_encoding.0.temp_encode.2", swap_kv=False),
            "norm2": norm_params(sd, "temporal_encoding.0.temp_encode.3",
                                 "layer"),
            "proj_out": linear_params(sd,
                                      "temporal_encoding.0.temp_encode.4"),
        },
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="layer", ff_norm2="rms",
            xpos_prefix=f"languageEncoders.{i}.xPos")
        params[f"visionEncoders_{i}"] = encoder_params(
            sd, f"visionEncoders.{i}", norm="layer", ff_norm2="rms",
            xpos_prefix=f"visionEncoders.{i}.posEmbed")
    return params


def import_meant_vqa(sd: Mapping, num_encoders: int) -> Dict:
    """`meant/meant_vqa.py` state_dict -> meant_vqa params (RMSNorm
    generation; the reference's constructed-but-unused multimodal_embedding /
    multimodal_encoding blocks are skipped — they are dead in its forward,
    `meant/meant_vqa.py:221-228`)."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "patchEmbed": linear_params(sd, "patchEmbed.1"),
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "rms"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="rms",
            xpos_prefix=f"languageEncoders.{i}.xPos")
        params[f"visionEncoders_{i}"] = encoder_params(
            sd, f"visionEncoders.{i}", norm="rms",
            xpos_prefix=f"visionEncoders.{i}.posEmbed")
    return params


def import_timesformer(sd: Mapping, depth: int, prefix: str = "") -> Dict:
    """Phil-Wang TimeSformer (`src/meant/timesformer_pytorch.py:150-265`)
    state_dict -> meant_tpu.nn.timesformer.TimeSformer params.
    Layer layout: layers.{i}.{0,1,2} = PreNorm(time_attn / spatial_attn / ff)
    with .norm + .fn (Attention: to_qkv bias-free, to_out.0; FeedForward:
    net.0 / net.3)."""
    p = prefix
    params = {
        "to_patch_embedding": {
            "kernel": _t(sd[f"{p}to_patch_embedding.weight"]).T,
            "bias": _t(sd[f"{p}to_patch_embedding.bias"]),
        },
        "cls_token": _t(sd[f"{p}cls_token"]),
    }
    for i in range(depth):
        for slot, norm_name, attn_name in ((0, f"time_norm_{i}",
                                            f"time_attn_{i}"),
                                           (1, f"space_norm_{i}",
                                            f"space_attn_{i}")):
            base = f"{p}layers.{i}.{slot}"
            params[norm_name] = {
                "scale": _t(sd[f"{base}.norm.weight"]),
                "bias": _t(sd[f"{base}.norm.bias"]),
            }
            params[attn_name] = {
                "to_qkv": {"kernel": _t(sd[f"{base}.fn.to_qkv.weight"]).T},
                "to_out": {
                    "kernel": _t(sd[f"{base}.fn.to_out.0.weight"]).T,
                    "bias": _t(sd[f"{base}.fn.to_out.0.bias"]),
                },
            }
        base = f"{p}layers.{i}.2"
        params[f"ff_norm_{i}"] = {
            "scale": _t(sd[f"{base}.norm.weight"]),
            "bias": _t(sd[f"{base}.norm.bias"]),
        }
        params[f"ff_{i}"] = {
            "proj_in": {"kernel": _t(sd[f"{base}.fn.net.0.weight"]).T,
                        "bias": _t(sd[f"{base}.fn.net.0.bias"])},
            "proj_out": {"kernel": _t(sd[f"{base}.fn.net.3.weight"]).T,
                         "bias": _t(sd[f"{base}.fn.net.3.bias"])},
        }
    if f"{p}to_out.0.weight" in sd:
        params["out_norm"] = {"scale": _t(sd[f"{p}to_out.0.weight"]),
                              "bias": _t(sd[f"{p}to_out.0.bias"])}
        params["out_proj"] = {"kernel": _t(sd[f"{p}to_out.1.weight"]).T,
                              "bias": _t(sd[f"{p}to_out.1.bias"])}
    return params


def _attn_pool_params(sd: Mapping, prefix: str) -> Dict:
    """lang_prep/image_prep: Sequential(Linear, LayerNorm, GELU, Linear,
    Softmax) (`src/meant/meant_timesformer.py:274-279`)."""
    return {
        "proj1": linear_params(sd, f"{prefix}.0"),
        "norm": {"scale": _t(sd[f"{prefix}.1.weight"]),
                 "offset": _t(sd[f"{prefix}.1.bias"])},
        "proj2": linear_params(sd, f"{prefix}.3"),
    }


def import_meant_timesformer(sd: Mapping, num_encoders: int,
                             ts_depth: int = 1) -> Dict:
    """src-era meant_timesformer (`src/meant/meant_timesformer.py:200-358`).
    The reference's constructed-but-unused visionEncoders/patchEmbed/lang_red
    are skipped (dead in its forward)."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "timesformer": import_timesformer(sd, ts_depth,
                                          prefix="timesformer."),
        "lang_prep": _attn_pool_params(sd, "lang_prep"),
        "image_prep": _attn_pool_params(sd, "image_prep"),
        "temporal_encoding_0": {
            "norm1": norm_params(sd, "temporal_encoding.0.temp_encode.0",
                                 "layer"),
            "proj_in": linear_params(sd,
                                     "temporal_encoding.0.temp_encode.1"),
            "temporal": attention_params(
                sd, "temporal_encoding.0.temp_encode.2", swap_kv=False),
            "norm2": norm_params(sd, "temporal_encoding.0.temp_encode.3",
                                 "layer"),
            "proj_out": linear_params(sd,
                                      "temporal_encoding.0.temp_encode.4"),
        },
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="layer", ff_norm2="rms",
            xpos_prefix=f"languageEncoders.{i}.xPos")
    return params


def import_meant_mean_pooling(sd: Mapping, num_encoders: int,
                              ts_depth: int = 1) -> Dict:
    """src-era meant_mean_pooling (`src/meant/meant_mean_pooling.py`):
    mean-pooled text + TimeSformer image branch through the degenerate
    image_proj (Linear(981,1) + LayerNorm(1) + GELU)."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "timesformer": import_timesformer(sd, ts_depth,
                                          prefix="timesformer."),
        "image_proj": _seq_projection_params(sd, "image_proj"),
        "temporal_encoding_0": {
            "norm1": norm_params(sd, "temporal_encoding.0.temp_encode.0",
                                 "layer"),
            "proj_in": linear_params(sd,
                                     "temporal_encoding.0.temp_encode.1"),
            "temporal": attention_params(
                sd, "temporal_encoding.0.temp_encode.2", swap_kv=False),
            "norm2": norm_params(sd, "temporal_encoding.0.temp_encode.3",
                                 "layer"),
            "proj_out": linear_params(sd,
                                      "temporal_encoding.0.temp_encode.4"),
        },
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="layer", ff_norm2="rms",
            xpos_prefix=f"languageEncoders.{i}.xPos")
    return params


def import_meant_tweet_price(sd: Mapping, num_encoders: int) -> Dict:
    """meantTweetPrice (`src/meant/meant_tweet_price.py:139-219`): RMSNorm
    languageEncoders; temporalEncoder = temp_embedding + [RMSNorm, Linear,
    temporal(src straight q/k/v), RMSNorm, Dropout, Linear] — proj_out at
    temp_encode.5 (dropout at 4)."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "temporal_encoding_0": {
            "temp_embedding": _t(sd["temporal_encoding.0.temp_embedding"]),
            "norm1": norm_params(sd, "temporal_encoding.0.temp_encode.0",
                                 "rms"),
            "proj_in": linear_params(sd,
                                     "temporal_encoding.0.temp_encode.1"),
            "temporal": attention_params(
                sd, "temporal_encoding.0.temp_encode.2", swap_kv=False),
            "norm2": norm_params(sd, "temporal_encoding.0.temp_encode.3",
                                 "rms"),
            "proj_out": linear_params(sd,
                                      "temporal_encoding.0.temp_encode.5"),
        },
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="rms",
            xpos_prefix=f"languageEncoders.{i}.xPos")
    return params


def import_meant_tweet(sd: Mapping, num_encoders: int) -> Dict:
    """meant_tweet (`meant/meant_tweet.py:114-166`, with the `final_resi`
    NameError at :81 patched to `final_resid`): RMSNorm languageEncoders,
    slim temporalEncoder (temp_embedding + [Linear, temporal, Linear]),
    LayerNorm head. Top-level temporal => swapped k/v naming."""
    params = {
        "embedding": roberta_embedding_params(sd, "embedding.0."),
        "temporal_encoding_0": _slim_temporal_params(sd,
                                                     "temporal_encoding.0"),
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }
    for i in range(num_encoders):
        params[f"languageEncoders_{i}"] = encoder_params(
            sd, f"languageEncoders.{i}", norm="rms",
            xpos_prefix=f"languageEncoders.{i}.xPos")
    return params


def import_meant_price(sd: Mapping) -> Dict:
    """meant_price (`src/meant/meantPrice.py:67-100`): norm-free
    temporalEncoder [Linear, temporal, Linear] (LayerNorms commented out),
    src temporal => straight q/k/v order, LayerNorm head."""
    return {
        "temporal_encoding_0": {
            "proj_in": linear_params(sd,
                                     "temporal_encoding.0.temp_encode.0"),
            "temporal": attention_params(
                sd, "temporal_encoding.0.temp_encode.1", swap_kv=False),
            "proj_out": linear_params(sd,
                                      "temporal_encoding.0.temp_encode.2"),
        },
        "mlpHead": {
            "norm": norm_params(sd, "mlpHead.0", "layer"),
            "proj": linear_params(sd, "mlpHead.1"),
        },
    }


def import_temporal2(sd: Mapping, prefix: str = "") -> Dict:
    """temporal_2 (`src/meant/temporal_new.py:7-69`) -> TemporalAttention2
    params. Straight q/k/v order (`temporal_new.py:38-41` maps q->q_mat,
    v->v_mat, k->k_mat)."""
    p = prefix
    return {
        "q": linear_params(sd, f"{p}q"),
        "k": linear_params(sd, f"{p}k"),
        "v": linear_params(sd, f"{p}v"),
        "multi_mad": linear_params(sd, f"{p}multi_mad.0"),
    }


def import_mlp_encoder(sd: Mapping, num_hidden_layers: int = 3) -> Dict:
    """mlpEncoder (`src/meant/simple_mlp.py:5-28`)."""
    params = {
        "input_layer": linear_params(sd, "input_layer.0"),
        "input_norm": norm_params(sd, "input_layer.1", "layer"),
        "output_layer": linear_params(sd, "output_layer.0"),
    }
    for i in range(num_hidden_layers):
        params[f"hidden_{i}"] = linear_params(sd, f"hidden.{i}.0")
        params[f"hidden_norm_{i}"] = norm_params(sd, f"hidden.{i}.1",
                                                 "layer")
    return params


def import_lstm_encoder(sd: Mapping, num_hidden_layers: int = 3) -> Dict:
    """LSTMEncoder (`src/meant/simple_mlp.py:31-49`): torch nn.LSTM gate
    order is [input, forget, cell(g), output]; flax OptimizedLSTMCell keeps
    per-gate Denses — input-side kernels (ii/if/ig/io, no bias) and
    hidden-side kernels (hi/hf/hg/ho) whose bias absorbs
    bias_ih + bias_hh."""
    params = {
        "input_layer": linear_params(sd, "input_layer.0"),
        "input_norm": norm_params(sd, "input_layer.1", "layer"),
        "output_layer": linear_params(sd, "output_layer.0"),
    }
    gates = ("i", "f", "g", "o")
    for layer in range(num_hidden_layers):
        w_ih = _t(sd[f"hidden.weight_ih_l{layer}"])   # (4h, in)
        w_hh = _t(sd[f"hidden.weight_hh_l{layer}"])   # (4h, h)
        b = (_t(sd[f"hidden.bias_ih_l{layer}"])
             + _t(sd[f"hidden.bias_hh_l{layer}"]))    # (4h,)
        h = w_hh.shape[1]
        cell = {}
        for gi, gate in enumerate(gates):
            sl = slice(gi * h, (gi + 1) * h)
            cell[f"i{gate}"] = {"kernel": w_ih[sl].T}
            cell[f"h{gate}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
        params[f"lstm_{layer}"] = cell
    return params


def _mha_proj(sd: Mapping, prefix: str, num_heads: int) -> Dict:
    """torch (d, d) attention projection -> flax MHA per-head kernels."""
    w = _t(sd[f"{prefix}.weight"]).T
    b = _t(sd[f"{prefix}.bias"])
    d = w.shape[0]
    dh = d // num_heads
    return {"kernel": w.reshape(d, num_heads, dh),
            "bias": b.reshape(num_heads, dh)}


def _mha_out(sd: Mapping, prefix: str, num_heads: int) -> Dict:
    w = _t(sd[f"{prefix}.weight"]).T
    d = w.shape[1]
    dh = d // num_heads
    return {"kernel": w.reshape(num_heads, dh, d),
            "bias": _t(sd[f"{prefix}.bias"])}


def import_visual_bert(sd: Mapping, num_layers: int,
                       num_heads: int = 12) -> Dict:
    """HF `VisualBertModel` state_dict -> meant_tpu.nn.hf_baselines.
    VisualBertModel params (text+visual embeddings, BERT layers, pooler)."""
    e = "embeddings."
    params = {
        "text_embeddings": {
            "word_embeddings": _t(sd[f"{e}word_embeddings.weight"]),
            "position_embeddings": _t(sd[f"{e}position_embeddings.weight"]),
            "token_type_embeddings":
                _t(sd[f"{e}token_type_embeddings.weight"]),
        },
        "visual_projection": {
            "kernel": _t(sd[f"{e}visual_projection.weight"]).T,
            "bias": _t(sd[f"{e}visual_projection.bias"]),
        },
        "visual_position_embeddings":
            _t(sd[f"{e}visual_position_embeddings.weight"]),
        "visual_token_type_embeddings":
            _t(sd[f"{e}visual_token_type_embeddings.weight"]),
        "embeddings_norm": {"scale": _t(sd[f"{e}LayerNorm.weight"]),
                            "bias": _t(sd[f"{e}LayerNorm.bias"])},
        "pooler": {"kernel": _t(sd["pooler.dense.weight"]).T,
                   "bias": _t(sd["pooler.dense.bias"])},
    }
    for i in range(num_layers):
        params[f"layer_{i}"] = roberta_layer_params(
            sd, f"encoder.layer.{i}", num_heads)
    return params


def import_vilt(sd: Mapping, num_layers: int, num_heads: int = 12) -> Dict:
    """HF `ViltModel` state_dict -> meant_tpu.nn.hf_baselines.ViltModel
    params. ViLT layer naming: attention.attention.{query,key,value} +
    attention.output.dense (pre-LN: layernorm_before/after, no residual
    norms); conv patch kernel (out,in,kh,kw) -> (kh,kw,in,out)."""
    e = "embeddings."
    te = f"{e}text_embeddings."
    params = {
        "text_embeddings": {
            "word_embeddings": _t(sd[f"{te}word_embeddings.weight"]),
            "position_embeddings":
                _t(sd[f"{te}position_embeddings.weight"]),
            "token_type_embeddings":
                _t(sd[f"{te}token_type_embeddings.weight"]),
            "norm": {"scale": _t(sd[f"{te}LayerNorm.weight"]),
                     "bias": _t(sd[f"{te}LayerNorm.bias"])},
        },
        "cls_token": _t(sd[f"{e}cls_token"]),
        "position_embeddings": _t(sd[f"{e}position_embeddings"]),
        "token_type_embeddings": _t(sd[f"{e}token_type_embeddings.weight"]),
        "patch_projection": {
            "kernel": _t(sd[f"{e}patch_embeddings.projection.weight"])
            .transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{e}patch_embeddings.projection.bias"]),
        },
        "layernorm": {"scale": _t(sd["layernorm.weight"]),
                      "bias": _t(sd["layernorm.bias"])},
        "pooler": {"kernel": _t(sd["pooler.dense.weight"]).T,
                   "bias": _t(sd["pooler.dense.bias"])},
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": _mha_proj(sd, f"{p}.attention.attention.query",
                                   num_heads),
                "key": _mha_proj(sd, f"{p}.attention.attention.key",
                                 num_heads),
                "value": _mha_proj(sd, f"{p}.attention.attention.value",
                                   num_heads),
                "out": _mha_out(sd, f"{p}.attention.output.dense",
                                num_heads),
            },
            "layernorm_before": {
                "scale": _t(sd[f"{p}.layernorm_before.weight"]),
                "bias": _t(sd[f"{p}.layernorm_before.bias"])},
            "layernorm_after": {
                "scale": _t(sd[f"{p}.layernorm_after.weight"]),
                "bias": _t(sd[f"{p}.layernorm_after.bias"])},
            "intermediate": {
                "kernel": _t(sd[f"{p}.intermediate.dense.weight"]).T,
                "bias": _t(sd[f"{p}.intermediate.dense.bias"])},
            "output": {"kernel": _t(sd[f"{p}.output.dense.weight"]).T,
                       "bias": _t(sd[f"{p}.output.dense.bias"])},
        }
    return params


def import_audio_encoder(sd: Mapping, num_layers: int = 3, nhead: int = 2,
                         emb_prefix: str = "audio_emb.",
                         enc_prefix: str = "audio_encoder.") -> Dict:
    """MOSI audio branch (`src/meant/meant_mosi.py:294-307`): torch
    nn.TransformerEncoder (packed in_proj qkv) + the cls nn.Embedding ->
    meant_tpu AudioEncoder params."""
    params = {"cls_emb": _t(sd[f"{emb_prefix}weight"]).reshape(1, 1, -1)}
    for i in range(num_layers):
        p = f"{enc_prefix}layers.{i}."
        w = _t(sd[f"{p}self_attn.in_proj_weight"])       # (3d, d)
        b = _t(sd[f"{p}self_attn.in_proj_bias"])
        d = w.shape[1]
        dh = d // nhead
        for name, sl in (("q", slice(0, d)), ("k", slice(d, 2 * d)),
                         ("v", slice(2 * d, 3 * d))):
            params.setdefault(f"attn_{i}", {})[
                {"q": "query", "k": "key", "v": "value"}[name]] = {
                "kernel": w[sl].T.reshape(d, nhead, dh),
                "bias": b[sl].reshape(nhead, dh),
            }
        ow = _t(sd[f"{p}self_attn.out_proj.weight"]).T
        params[f"attn_{i}"]["out"] = {
            "kernel": ow.reshape(nhead, dh, d),
            "bias": _t(sd[f"{p}self_attn.out_proj.bias"])}
        params[f"ff1_{i}"] = {"kernel": _t(sd[f"{p}linear1.weight"]).T,
                              "bias": _t(sd[f"{p}linear1.bias"])}
        params[f"ff2_{i}"] = {"kernel": _t(sd[f"{p}linear2.weight"]).T,
                              "bias": _t(sd[f"{p}linear2.bias"])}
        params[f"norm1_{i}"] = {"scale": _t(sd[f"{p}norm1.weight"]),
                                "bias": _t(sd[f"{p}norm1.bias"])}
        params[f"norm2_{i}"] = {"scale": _t(sd[f"{p}norm2.weight"]),
                                "bias": _t(sd[f"{p}norm2.bias"])}
    return params


# ---- reverse port: flax params -> reference torch state_dict -------------

def _unlinear(tree: Mapping, out: Dict, prefix: str) -> None:
    d = tree["dense"]
    out[f"{prefix}.weight"] = np.asarray(d["kernel"]).T
    if "bias" in d:
        out[f"{prefix}.bias"] = np.asarray(d["bias"])


def _unnorm(tree: Mapping, out: Dict, prefix: str, kind: str) -> None:
    if kind == "rms":
        out[f"{prefix}.scale"] = np.asarray(tree["scale"])
        if "offset" in tree:
            out[f"{prefix}.offset"] = np.asarray(tree["offset"])
    else:
        out[f"{prefix}.weight"] = np.asarray(tree["scale"])
        out[f"{prefix}.bias"] = np.asarray(tree["offset"])


def _unattention(tree: Mapping, out: Dict, prefix: str,
                 swap_kv: bool = True) -> None:
    """Inverse of attention_params: flax true-q/k/v back to the reference's
    swapped naming (its `v` Linear computes keys, `k` computes values)."""
    _unlinear(tree["q"], out, f"{prefix}.q")
    _unlinear(tree["k"], out, f"{prefix}.{'v' if swap_kv else 'k'}")
    _unlinear(tree["v"], out, f"{prefix}.{'k' if swap_kv else 'v'}")
    _unlinear(tree["multi_mad"], out, f"{prefix}.multi_mad")


def _unencoder(tree: Mapping, out: Dict, prefix: str, norm: str = "rms",
               ff_norm2: str = None, dropout_in_encode: bool = True,
               xpos_prefix: str = None) -> None:
    """Inverse of encoder_params. dropout_in_encode=True is the
    languageEncoder layout (proj_out/ff_out at ModuleList index 5);
    False is the visionEncoder layout (index 4)."""
    ff_norm2 = ff_norm2 or norm
    # languageEncoder carries Dropout in both ModuleLists => final Linears
    # at index 5; visionEncoder has none => index 4 (`meant/meant.py:57-64,
    # 100-107`)
    idx = 5 if dropout_in_encode else 4
    _unnorm(tree["norm1"], out, f"{prefix}.encode.0", norm)
    _unlinear(tree["proj_in"], out, f"{prefix}.encode.1")
    _unattention(tree["attn"], out, f"{prefix}.encode.2", swap_kv=True)
    _unnorm(tree["norm2"], out, f"{prefix}.encode.3", norm)
    _unlinear(tree["proj_out"], out, f"{prefix}.encode.{idx}")
    _unnorm(tree["norm3"], out, f"{prefix}.encode2.0", norm)
    _unlinear(tree["ff_in"], out, f"{prefix}.encode2.1")
    _unnorm(tree["norm4"], out, f"{prefix}.encode2.3", ff_norm2)
    _unlinear(tree["ff_out"], out, f"{prefix}.encode2.{idx}")
    if xpos_prefix and "freqs" in tree["attn"]:
        out[f"{xpos_prefix}.freqs"] = np.asarray(tree["attn"]["freqs"])


def _ensure_unrolled(params: Mapping, num_encoders: int) -> Mapping:
    """Accept either encoder-param layout: if the tree was trained with
    `scan_layers=True` (one `<prefix>_scan` subtree with a leading layer
    axis — nn/stack.py), convert back to the unrolled `<prefix>_{i}`
    layout the torch state_dict mirrors."""
    from meant_tpu.nn.stack import unstack_encoder_params
    for prefix in ("languageEncoders", "visionEncoders"):
        if f"{prefix}_scan" in params:
            params = unstack_encoder_params(dict(params), prefix,
                                            num_encoders)
    return params


def export_meant(params: Mapping, num_encoders: int) -> Dict:
    """Inverse of import_meant: a meant_tpu `meant` param tree back to the
    reference's torch state_dict layout (numpy values — load with
    `ref.load_state_dict({k: torch.tensor(v) ...})`). Round-trip tested in
    tests/test_port.py. Accepts both encoder layouts (unrolled or
    scan_layers-stacked)."""
    params = _ensure_unrolled(params, num_encoders)
    out: Dict = {}
    emb = params["embedding"]
    out["embedding.0.word_embeddings.weight"] = \
        np.asarray(emb["word_embeddings"])
    out["embedding.0.position_embeddings.weight"] = \
        np.asarray(emb["position_embeddings"])
    out["embedding.0.token_type_embeddings.weight"] = \
        np.asarray(emb["token_type_embeddings"])
    out["embedding.0.LayerNorm.weight"] = np.asarray(emb["ln_scale"])
    out["embedding.0.LayerNorm.bias"] = np.asarray(emb["ln_bias"])
    _unlinear(params["patchEmbed"], out, "patchEmbed.1")
    t = params["temporal_encoding_0"]
    out["temporal_encoding.0.temp_embedding"] = \
        np.asarray(t["temp_embedding"])
    _unnorm(t["norm1"], out, "temporal_encoding.0.temp_encode.0", "rms")
    _unlinear(t["proj_in"], out, "temporal_encoding.0.temp_encode.1")
    _unattention(t["temporal"], out, "temporal_encoding.0.temp_encode.2",
                 swap_kv=True)
    _unnorm(t["norm2"], out, "temporal_encoding.0.temp_encode.3", "rms")
    _unlinear(t["proj_out"], out, "temporal_encoding.0.temp_encode.4")
    _unnorm(params["mlpHead"]["norm"], out, "mlpHead.0", "rms")
    _unlinear(params["mlpHead"]["proj"], out, "mlpHead.1")
    for i in range(num_encoders):
        _unencoder(params[f"languageEncoders_{i}"], out,
                   f"languageEncoders.{i}", norm="rms",
                   dropout_in_encode=True,
                   xpos_prefix=f"languageEncoders.{i}.encode.2.xPos")
        _unencoder(params[f"visionEncoders_{i}"], out,
                   f"visionEncoders.{i}", norm="rms",
                   dropout_in_encode=False,
                   xpos_prefix=f"visionEncoders.{i}.encode.2.pos_emb")
        # torch registers the shared rotary module twice (encoder attribute
        # AND inside the attention) — emit both aliases
        inner = f"languageEncoders.{i}.encode.2.xPos.freqs"
        if inner in out:
            out[f"languageEncoders.{i}.xPos.freqs"] = out[inner]
        inner = f"visionEncoders.{i}.encode.2.pos_emb.freqs"
        if inner in out:
            out[f"visionEncoders.{i}.posEmbed.freqs"] = out[inner]
    return out
