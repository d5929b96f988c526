"""Shared CLI plumbing: the reference's argparse flag set
(`in_loop_train.py:384-434` — flag names preserved so launch scripts port
unchanged), str2bool, and model construction by name."""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def str2bool(v):
    """`in_loop_train.py:54-62`."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def base_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # Learning rate scheduler
    p.add_argument("-t0", "--t0", type=int, default=7)
    p.add_argument("-tm", "--tmax", type=int, default=10)
    p.add_argument("-lrst", "--learning_rate_scheduler_type", type=str,
                   default="cosine_warm")
    # optimizer
    p.add_argument("-l", "--learning_rate", type=float, default=5e-5)
    p.add_argument("-o", "--optimizer", type=str, default="AdamW")
    p.add_argument("-d", "--decay", type=float, default=0.0)
    p.add_argument("-b1", "--beta_1", type=float, default=0.9)
    p.add_argument("-b2", "--beta_2", type=float, default=0.999)
    # Training loop
    p.add_argument("-e", "--epoch", type=int, default=0)
    p.add_argument("-ne", "--num_epochs", type=int, default=10)
    p.add_argument("-es", "--early_stopping", type=str2bool, nargs="?",
                   const=False, default=False)
    p.add_argument("-s", "--stoppage", type=float, default=1e-4)
    p.add_argument("-tb", "--train_batch_size", type=int, default=16)
    p.add_argument("-eb", "--eval_batch_size", type=int, default=1)
    p.add_argument("-tesb", "--test_batch_size", type=int, default=1)
    p.add_argument("-testm", "--test_model", type=str2bool, nargs="?",
                   const=True, default=True)
    # Model specific
    p.add_argument("-mn", "--model_name", type=str, default="meant")
    p.add_argument("-nc", "--num_classes", type=int, default=2)
    p.add_argument("-t", "--task", type=str, default="classification")
    p.add_argument("-cl", "--cache_location", type=str)
    p.add_argument("-di", "--dimension", type=int, default=128)
    p.add_argument("-nl", "--num_layers", type=int, default=3)
    p.add_argument("-do", "--dropout", type=float, default=0.0)
    p.add_argument("-ptm", "--pretrained_model", type=str, default=None)
    p.add_argument("-p", "--pretrained", type=str2bool, nargs="?",
                   const=False, default=False)
    p.add_argument("-nec", "--num_encoders", type=int, default=12)
    p.add_argument("-img", "--image_only", type=str2bool, nargs="?",
                   const=False, default=False)
    p.add_argument("-lang", "--language_only", type=str2bool, nargs="?",
                   const=False, default=False)
    # hugging face
    p.add_argument("-hf", "--hugging_face_model", type=str2bool, nargs="?",
                   const=False, default=False)
    p.add_argument("-hfd", "--hugging_face_data", type=str, default=None)
    p.add_argument("-hft", "--hugging_face_tokenizer", type=str, default=None)
    # Miscellaneous
    p.add_argument("-db", "--debug", type=bool, default=False)
    p.add_argument("-fp", "--file_path", type=str, default=".")
    p.add_argument("-rid", "--run_id", type=str, required=True)
    p.add_argument("-lag", "--lag", type=int, default=5)
    p.add_argument("-norm", "--normalize", type=str2bool, nargs="?",
                   const=False, default=False)
    p.add_argument("-ds", "--dataset", type=str, default="Tempstock")
    # TPU-native extras (not in the reference)
    p.add_argument("--data_dir", type=str, default=None,
                   help="Directory with the dataset .npy/.csv files; "
                        "synthetic data when omitted (smoke runs)")
    p.add_argument("--bf16", type=str2bool, nargs="?", const=True,
                   default=True, help="bf16 activations (fp32 params)")
    p.add_argument("--flash", type=str, nargs="?", const="auto",
                   default="auto",
                   help="Pallas flash-attention kernels: true/false/auto "
                        "(auto = on for seq_len >= 256, where the kernel "
                        "beats XLA and avoids the fp32-probs HBM blowup)")
    p.add_argument("--track", type=str2bool, nargs="?", const=False,
                   default=False)
    p.add_argument("--synthetic_n", type=int, default=64,
                   help="synthetic sample count when --data_dir is omitted")
    p.add_argument("--seed", type=int, default=0,
                   help="init/dropout PRNG seed (run_other_models pins 42 "
                        "to mirror the reference's torch.manual_seed)")
    p.add_argument("--buckets", type=str, default=None,
                   help="comma-separated length buckets for bucketed "
                        "training batches (e.g. 128,256,384,512) — the "
                        "static-shape equivalent of dynamic padding")
    p.add_argument("--fsdp", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="FSDP/ZeRO-3: shard params + Adam moments over the "
                        "data axis (parallel/fsdp.py)")
    p.add_argument("--mu_bf16", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="store the first Adam moment in bf16 (halves its "
                        "HBM footprint; fp32 is the parity config)")
    p.add_argument("--logits_head", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="DEFECTS #23 repair: classifier emits logits "
                        "instead of sigmoid outputs, lifting the "
                        "sigmoid-CE saturation lr ceiling (meant / "
                        "meant_src; parity default off)")
    p.add_argument("--scan_layers", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="roll each encoder tower into ONE lax.scan over "
                        "layer-stacked params (nn/stack.py): O(1)-in-depth "
                        "program size and compile time for deep configs "
                        "(meant-family towers)")
    p.add_argument("--remat", nargs="?", const="full", default=False,
                   choices=["full", "dots"],
                   help="rematerialize encoder blocks: bare --remat = "
                        "'full' (save nothing), '--remat dots' = selective "
                        "(matmul outputs saved; nn/stack.py) — the "
                        "HBM-vs-FLOPs lever (meant-family towers)")
    p.add_argument("--hf_cache", type=str, default=None,
                   help="local HuggingFace cache (hub layout or snapshot "
                        "dir): initialize from pretrained weights exactly "
                        "like the reference's from_pretrained flow "
                        "(in_loop_train.py:440-507 — bertweet embeddings "
                        "into meant-family models; full backbones for "
                        "bertweet/vilt/vl_bert, word embeddings swapped "
                        "for bertweet's). No network is touched; a missing "
                        "cache is a hard error")
    p.add_argument("--full_mlm_head", action="store_true",
                   help="MLM: compute the vocab head at ALL positions (the "
                        "reference's literal compute) instead of gathering "
                        "the masked ones first — same loss and gradients "
                        "(CE ignores -100), 1.46x slower on chip at b64")
    p.add_argument("--seq_len", type=int, default=128)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--text_dim", type=int, default=768)
    p.add_argument("--image_dim", type=int, default=768)
    p.add_argument("--vocab_size", type=int, default=64001)
    p.add_argument("--num_heads", type=int, default=8)
    return p


def split_train_val_test(data: dict):
    """80/10/10 split of a dict-of-arrays dataset: val (early stopping),
    test (final metric — held OUT of model selection; scoring the val slice
    as "test" is optimistically biased by the early-stop choice), train.
    On sets too small for three slices the val slice doubles as test."""
    n = len(next(iter(data.values())))
    n_val = max(n // 10, 1)
    n_test = n_val if n > 2 * n_val else 0
    val = {k: v[:n_val] for k, v in data.items()}
    test = ({k: v[n_val:n_val + n_test] for k, v in data.items()}
            if n_test else val)
    train = {k: v[n_val + n_test:] for k, v in data.items()}
    return train, val, test


def load_config(name: str) -> dict:
    """Load a model hyperparameter JSON (equivalent of the reference's
    `src/hug/configs/*.json` loaded with local_files_only AutoConfig,
    `in_loop_train.py:454-464`)."""
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        f"{name}.json")
    with open(path) as f:
        return json.load(f)


def embedding_from_config(name: str):
    from meant_tpu.models import EmbeddingConfig
    cfg = load_config(name)
    return EmbeddingConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        max_position_embeddings=cfg["max_position_embeddings"],
        type_vocab_size=cfg.get("type_vocab_size", 1),
        padding_idx=cfg.get("pad_token_id", 1),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        dropout=cfg.get("hidden_dropout_prob", 0.1))


def reject_stack_flags(args, harness: str):
    """--scan_layers/--remat apply to meant-family towers only; harnesses
    that build HF-backbone models refuse rather than silently ignore (the
    run record must never claim a config the model didn't use)."""
    if getattr(args, "scan_layers", False) or getattr(args, "remat", False):
        raise SystemExit(f"--scan_layers/--remat are not supported by the "
                         f"{harness} harness (no meant-family towers)")


def build_model(args, emb_cfg=None):
    """Model registry keyed by the reference's --model_name values
    (`in_loop_train.py:440-541`, `src/trainer.py:409-755`)."""
    from meant_tpu.models import (EmbeddingConfig, meant, meantPrice,
                                  meantTweetPrice, meant_mean_pooling,
                                  meant_mosi, meant_price, meant_src,
                                  meant_timesformer, meant_tweet,
                                  meant_tweet_no_lag, meant_vision,
                                  meant_vqa, mlpEncoder, LSTMEncoder)

    # seq-length-aware flash dispatch (see README throughput matrix)
    if isinstance(args.flash, str):
        if args.flash.lower() in ("auto",):
            args.flash = args.seq_len >= 256
        else:
            args.flash = args.flash.lower() in ("yes", "true", "t", "y", "1")
    td, imd = args.text_dim, args.image_dim
    emb = emb_cfg or EmbeddingConfig(vocab_size=args.vocab_size,
                                     hidden_size=td)
    dtype = jnp.bfloat16 if args.bf16 else None
    size = args.image_size
    common = dict(num_heads=args.num_heads,
                  num_encoders=args.num_encoders, dtype=dtype)
    name = args.model_name
    logits_head = bool(getattr(args, "logits_head", False))
    scan_layers = bool(getattr(args, "scan_layers", False))
    remat = getattr(args, "remat", False)
    SCAN_MODELS = ("meant", "meant_src", "meant_vision", "meant_tweet",
                   "meant_tweet_no_lag", "meantPrice", "meant_vqa",
                   "meant_timesformer", "meant_mean_pooling", "meant_mosi")
    if (scan_layers or remat) and name not in SCAN_MODELS:
        # refuse rather than silently ignore: the run record must never
        # claim a config the model didn't actually use
        raise SystemExit(f"--scan_layers/--remat are only supported by "
                         f"{'/'.join(SCAN_MODELS)} (got --model_name {name})")
    stack = dict(scan_layers=scan_layers, remat=remat)
    if name == "meant":
        return meant(td, imd, 4, size, size, 16, args.lag,
                     args.num_classes, embedding=emb, flash=args.flash,
                     channels=4, logits_head=logits_head, **stack, **common)
    if name == "meant_src":
        return meant_src(td, imd, 5, size, size, 16, args.lag,
                         args.num_classes, embedding=emb, flash=args.flash,
                         channels=3, seq_len=512, logits_head=logits_head,
                         **stack, **common)
    if name == "meant_vision":
        return meant_vision(imd, 4, size, size, 16, args.lag,
                            args.num_classes, flash=args.flash, channels=4,
                            **stack, **common)
    if name == "meant_tweet":
        return meant_tweet(td, 4, args.lag, args.num_classes, embedding=emb,
                           flash=args.flash, **stack, **common)
    if name == "meant_tweet_no_lag":
        return meant_tweet_no_lag(td, 4, size, size, 16, args.num_classes,
                                  embedding=emb, **stack, **common)
    if name == "meantPrice":
        return meantPrice(td, imd, 4, size, size, 16, args.lag,
                          args.num_classes, embedding=emb, **stack, **common)
    if name == "meant_tweet_price":
        return meantTweetPrice(td, 5, args.lag, args.num_classes,
                               embedding=emb, flash=args.flash, **common)
    if name == "meant_price":
        # reference default num_heads=8 (head dim clamps to 1 at price_dim 5,
        # `src/meant/temporal.py:18-20`)
        return meant_price(5, args.lag, args.num_classes, num_heads=8,
                           dtype=dtype)
    if name == "meant_timesformer":
        return meant_timesformer(td, imd, 5, size, size, 16, args.lag,
                                 args.num_classes, embedding=emb,
                                 flash=args.flash, channels=3, **stack,
                                 **common)
    if name == "meant_mean_pooling":
        return meant_mean_pooling(td, imd, 5, size, size, 16, args.lag,
                                  args.num_classes, embedding=emb,
                                  flash=args.flash, channels=3, **stack,
                                  **common)
    if name == "meant_mosi":
        return meant_mosi(td, imd, lag=50, num_classes=args.num_classes,
                          embedding=None, **stack, **common)
    if name == "meant_vqa":
        return meant_vqa(td, imd, 4, size, size, 16, 1, args.num_classes,
                         embedding=emb, flash=args.flash, **stack, **common)
    if name == "teanet":
        from meant_tpu.models import teanet
        return teanet(dim=args.dimension, num_heads=4, lag=args.lag,
                      num_classes=args.num_classes,
                      vocab_size=args.vocab_size, price_dim=4,
                      num_layers=args.num_layers, dtype=dtype)
    if name == "bertweet":
        from meant_tpu.models import bertweet_wrapper
        return bertweet_wrapper(input_dim=td, output_dim=args.num_classes,
                                vocab_size=args.vocab_size,
                                num_layers=args.num_encoders,
                                num_heads=args.num_heads, dtype=dtype)
    if name == "vl_bert":
        from meant_tpu.models import vl_BERT_Wrapper
        return vl_BERT_Wrapper(input_dim=td, output_dim=args.num_classes,
                               vocab_size=args.vocab_size,
                               num_layers=args.num_encoders,
                               num_heads=args.num_heads, dtype=dtype)
    if name == "vilt":
        from meant_tpu.models import ViltWrapper
        return ViltWrapper(input_dim=td, output_dim=args.num_classes,
                           vocab_size=args.vocab_size,
                           num_layers=args.num_encoders,
                           num_heads=args.num_heads, dtype=dtype)
    if name == "mlp":
        return mlpEncoder(5, args.num_classes, args.dimension,
                          args.num_layers)
    if name == "lstm":
        return LSTMEncoder(5, args.num_classes, args.dimension,
                           args.num_layers)
    raise ValueError(f"model {name} not supported")
