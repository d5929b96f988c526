"""GENIA/JNLPBA NER harness — named equivalent of
`src/hug/in_loop_genia.py` (biobert token classification on
siddharthtumre/jnlpba-split with sentence joining).

Reference flag set preserved (`in_loop_genia.py:350-380`): -js/--join_size,
-s/--stoppage, -cl/--cache_location, -eb/-tesb batch sizes, plus the shared
hug training flags. Data: --data_dir with tokens/tags (ner_tokens.json:
[{"tokens": [...], "ner_tags": [...]}, ...]) or a prepared
ner_prepared.npz; synthetic tagged tokens in smoke mode (no network egress —
the HF dataset/biobert weights load only from local caches)."""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from meant_tpu.cli.common import base_parser, split_train_val_test, reject_stack_flags
from meant_tpu.data import ArrayLoader
from meant_tpu.native import fnv1a_tokenize
from meant_tpu.parallel import make_mesh
from meant_tpu.train.ner import (TokenClassifier, align_labels,
                                 join_examples, ner_trainer)


def genia_parser():
    # base_parser already carries the shared hug flags (-s/--stoppage,
    # -cl/--cache_location, -eb/-tesb, ...)
    p = base_parser()
    p.add_argument("-js", "--join_size", type=int, default=1,
                   help="Number of sentences to join together in each "
                        "training example")
    # reference defaults (`in_loop_genia.py:363`): 9 JNLPBA tag classes
    p.set_defaults(num_classes=9, model_name="biobert")
    return p


def _encode_word_level(tokens_list, tags_list, seq_len, vocab_size):
    """Word-level FNV encoding: one token per word. The tokenizer frames
    content as [BOS, w_0..w_{k-1}, EOS, pad...], so word_ids carries None
    for BOS/EOS/pad and k word indices in between — align_labels then
    labels exactly the word positions (-100 elsewhere), matching the
    reference's special-token policy (`in_loop_genia.py:131-144`)."""
    texts = [" ".join(t) for t in tokens_list]
    ids, enc_mask = fnv1a_tokenize(texts, seq_len, vocab_size)
    word_ids, labels = [], []
    for toks, tags in zip(tokens_list, tags_list):
        k = min(len(toks), seq_len - 2)
        word_ids.append([None] + list(range(k))
                        + [None] * (seq_len - 1 - k))
        labels.append(list(tags))
    aligned = align_labels(word_ids, labels)
    return {"input_ids": ids, "labels": aligned,
            "attention_mask": enc_mask.astype(np.float32)}


def load_data(args):
    if args.data_dir:
        npz = os.path.join(args.data_dir, "ner_prepared.npz")
        if os.path.exists(npz):
            z = np.load(npz)
            return {k: z[k] for k in ("input_ids", "attention_mask",
                                      "labels")}
        js = os.path.join(args.data_dir, "ner_tokens.json")
        with open(js) as f:
            rows = json.load(f)
        tokens = [r["tokens"] for r in rows]
        tags = [r.get("ner_tags", r.get("tags")) for r in rows]
        if args.join_size > 1:
            tokens, tags = join_examples(tokens, tags, args.join_size)
        return _encode_word_level(tokens, tags, args.seq_len,
                                  args.vocab_size)
    print("No --data_dir: synthetic GENIA-shaped NER data (smoke mode).")
    rng = np.random.RandomState(0)
    tokens = [[f"w{rng.randint(200)}" for _ in range(rng.randint(4, 10))]
              for _ in range(args.synthetic_n)]
    tags = [[int(rng.randint(args.num_classes)) for _ in t] for t in tokens]
    if args.join_size > 1:
        tokens, tags = join_examples(tokens, tags, args.join_size)
    return _encode_word_level(tokens, tags, args.seq_len, args.vocab_size)


def main(argv=None):
    args = genia_parser().parse_args(argv)
    reject_stack_flags(args, "in_loop_genia")
    data = load_data(args)
    train, val, test = split_train_val_test(data)
    model = TokenClassifier(
        num_labels=args.num_classes, vocab_size=args.vocab_size,
        hidden_size=args.text_dim, num_layers=args.num_encoders,
        num_heads=args.num_heads, dropout=args.dropout,
        dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = ner_trainer({
        "model": model, "model_name": args.model_name,
        "dataset": "jnlpba",
        "train_data": ArrayLoader(train, args.train_batch_size,
                                  shuffle=True),
        "val_data": ArrayLoader(val, max(args.eval_batch_size,
                                         args.train_batch_size)),
        "epochs": args.num_epochs, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "optimizer": args.optimizer,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders, "mesh": make_mesh(),
    })
    hist = trainer.train()
    metrics = trainer.token_f1(
        ArrayLoader(test, max(args.eval_batch_size, args.train_batch_size)),
        args.num_classes)
    print("Macro test f1:", metrics["f1_macro"])
    return hist, metrics


if __name__ == "__main__":
    main()
