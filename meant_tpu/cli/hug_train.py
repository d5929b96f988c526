"""Generic config-driven HF fine-tune harness — equivalent of
`src/hug/in_loop_train.py` (the 474-LoC generic NER/classification
fine-tuner whose model geometry comes from `configs/<model_name>.json`
via AutoConfig local_files_only, `in_loop_train.py:381-382`).

Where the named harnesses (in_loop_genia, tweet7) pin one dataset + config,
this one is the generic path: `-mn <name>` loads
`meant_tpu/configs/<name>.json` and builds the backbone from the config's
hidden_size/num_hidden_layers/num_attention_heads/vocab_size (and, for
token classification, num_labels/id2label), exactly how the reference
builds `AutoModelForTokenClassification.from_config(config)` when
`--pretrained` is false. `--pretrained true` grafts locally cached HF
weights through `utils/hf_port` when a cache exists (no network egress);
`-ptm` restores a previous run's orbax checkpoint (`in_loop_train.py:386`
whole-model torch.load equivalent).

Tasks (`-t/--task`): `token_classification` (default here — the reference
file is an NER fine-tuner, `in_loop_train.py:31` ner_trainer) and
`classification` (sequence-level, CLS head). Data: --data_dir with
ner_tokens.json / ner_prepared.npz (token task) or text_labels.json
(sequence task); synthetic smoke data otherwise.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import (base_parser, load_config,
                                  reject_stack_flags, split_train_val_test)
from meant_tpu.cli.in_loop_genia import _encode_word_level, load_data
from meant_tpu.data import ArrayLoader
from meant_tpu.native import fnv1a_tokenize
from meant_tpu.parallel import make_mesh
from meant_tpu.train.ner import TokenClassifier, join_examples, ner_trainer


def hug_parser():
    p = base_parser()
    p.add_argument("-js", "--join_size", type=int, default=1,
                   help="Number of sentences to join together in each "
                        "training example")
    p.add_argument("-m", "--metric", type=str, default=None,
                   help="Evaluation metric")
    p.add_argument("--config_json", type=str, default=None,
                   help="explicit config path (overrides "
                        "configs/<model_name>.json; tests / custom runs)")
    p.set_defaults(task="token_classification", num_classes=9,
                   model_name="bert_ner")
    return p


def _load_cfg(args) -> dict:
    if args.config_json:
        with open(args.config_json) as f:
            return json.load(f)
    return load_config(args.model_name)


def build_from_config(args):
    """TokenClassifier geometry from configs/<model_name>.json — the
    from_config path of `src/hug/in_loop_train.py:381-382`. The CLI's
    --num_classes ALWAYS sizes the head: the reference overwrites
    model.classifier with nn.Linear(..., args.num_classes) right after
    from_config (`in_loop_train.py:384`), so the config's num_labels only
    sizes the temporary head that gets replaced. We replicate that, but
    warn loudly when the config disagrees — silently training a 9-logit
    head on 15-label data corrupts loss/F1 with no crash."""
    cfg = _load_cfg(args)
    num_labels = args.num_classes or cfg.get("num_labels", 2)
    cfg_labels = cfg.get("num_labels")
    if cfg_labels is not None and cfg_labels != num_labels:
        print(f"WARNING: config declares num_labels={cfg_labels} but the "
              f"head is built with --num_classes={num_labels} (the "
              f"reference's classifier overwrite, in_loop_train.py:384). "
              f"Pass --num_classes {cfg_labels} to match the config.")
    model = TokenClassifier(
        num_labels=num_labels,
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        dropout=cfg.get("hidden_dropout_prob", 0.1),
        dtype=jnp.bfloat16 if args.bf16 else None)
    return model, cfg, num_labels


def _local_hf_backbone(args, cfg):
    """Backbone params from a locally cached torch state dict
    (--cache_location/<model_name>.bin or .pt — torch.load'able). Returns
    TokenClassifier-shaped params with the classifier head left to init."""
    import torch

    from meant_tpu.utils.port import import_hf_roberta

    cache = args.cache_location or os.path.join(
        os.path.expanduser("~"), ".cache", "meant_tpu", "hf")
    for ext in (".bin", ".pt"):
        path = os.path.join(cache, args.model_name + ext)
        if os.path.exists(path):
            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {"roberta": import_hf_roberta(
                sd, cfg["num_hidden_layers"],
                num_heads=cfg["num_attention_heads"])}
    raise FileNotFoundError(f"no {args.model_name}.bin/.pt under {cache}")


def load_sequence_data(args):
    """Sequence-classification data: text_labels.json
    ([{"text": ..., "label": int}, ...]) under --data_dir, else synthetic."""
    if args.data_dir:
        with open(os.path.join(args.data_dir, "text_labels.json")) as f:
            rows = json.load(f)
        texts = [r["text"] for r in rows]
        labels = [int(r["label"]) for r in rows]
    else:
        print("No --data_dir: synthetic text-classification data "
              "(smoke mode).")
        rng = np.random.RandomState(0)
        texts = [" ".join(f"w{rng.randint(200)}"
                          for _ in range(rng.randint(4, 12)))
                 for _ in range(args.synthetic_n)]
        labels = [int(rng.randint(args.num_classes))
                  for _ in range(args.synthetic_n)]
    ids, mask = fnv1a_tokenize(texts, args.seq_len, args.vocab_size)
    return {"input_ids": ids, "attention_mask": mask.astype(np.float32),
            "y": np.asarray(labels, np.int32)}


def main(argv=None):
    args = hug_parser().parse_args(argv)
    reject_stack_flags(args, "hug_train")

    if args.task == "token_classification":
        model, cfg, num_labels = build_from_config(args)
        args.vocab_size = cfg["vocab_size"]  # FNV ids must fit the table
        data = load_data(args)
        train, val, test = split_train_val_test(data)
        params = None
        if args.pretrained:
            # local-cache-only HF import (no egress): falls back to scratch
            # when no cache exists, mirroring the reference's from_config arm
            # (`in_loop_train.py:377-382` — pretrained=True downloads,
            # pretrained=False builds from the JSON config)
            try:
                params = _local_hf_backbone(args, cfg)
                print(f"grafted local HF cache weights for "
                      f"{args.model_name}")
            except FileNotFoundError as e:  # no cache in this sandbox
                print(f"no local HF cache ({e}); training from scratch")
            # any OTHER failure (corrupt .bin, geometry mismatch) means a
            # cache EXISTS but can't be grafted — raise rather than silently
            # fine-tune random weights the user believes are pretrained
        trainer = ner_trainer({
            "model": model, "model_name": args.model_name,
            "dataset": args.hugging_face_data or "local",
            "train_data": ArrayLoader(train, args.train_batch_size,
                                      shuffle=True),
            "val_data": ArrayLoader(val, max(args.eval_batch_size,
                                             args.train_batch_size)),
            "epochs": args.num_epochs, "lr": args.learning_rate,
            "decay": args.decay, "beta_1": args.beta_1,
            "beta_2": args.beta_2,
            "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
            "tmax": args.tmax, "optimizer": args.optimizer,
            "file_path": args.file_path, "run_id": args.run_id,
            "num_encoders": cfg["num_hidden_layers"], "mesh": make_mesh(),
            "init_params": params,
        })
        hist = trainer.train()
        metrics = trainer.token_f1(
            ArrayLoader(test, max(args.eval_batch_size,
                                  args.train_batch_size)), num_labels)
        print("Macro test f1:", metrics["f1_macro"])
        return hist, metrics

    if args.task == "classification":
        from meant_tpu.nn.roberta import bertweet_wrapper
        from meant_tpu.train.text_classify import text_classifier_trainer
        cfg = _load_cfg(args)
        args.vocab_size = cfg["vocab_size"]
        data = load_sequence_data(args)
        n_val = max(len(data["y"]) // 10, 1)
        train = {k: v[n_val:] for k, v in data.items()}
        val = {k: v[:n_val] for k, v in data.items()}
        model = bertweet_wrapper(
            input_dim=cfg["hidden_size"], output_dim=args.num_classes,
            vocab_size=cfg["vocab_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            dtype=jnp.bfloat16 if args.bf16 else None)
        trainer = text_classifier_trainer({
            "model": model, "train_loader": ArrayLoader(
                train, args.train_batch_size, shuffle=True),
            "val_loader": ArrayLoader(val, max(args.eval_batch_size,
                                               args.train_batch_size)),
            "num_classes": args.num_classes, "epochs": args.num_epochs,
            "lr": args.learning_rate, "decay": args.decay,
            "lrst": args.learning_rate_scheduler_type,
            "optimizer": args.optimizer, "loss": "Cross Entropy",
            "mesh": make_mesh(),
        })
        hist = trainer.train()
        return hist, None

    raise ValueError(f"unsupported task {args.task}")


if __name__ == "__main__":
    main()
