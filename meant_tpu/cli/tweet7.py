"""tweetner7 NER harness — named equivalent of `src/hug/tweet7.py`
(token classification on tner/tweetner7's *_2021 splits; NOT text
classification — the reference file trains AutoModelForTokenClassification
on tokens/tags).

Reference flag set preserved (`tweet7.py:340-376`): -js/--join_size,
-crf/--crf (NotImplementedError, faithful to `tweet7.py:391-392`),
-lrwp/--lr_warmup_step_ratio with the linear_warmup per-step schedule
(`tweet7.py:433,444-445`). Data: --data_dir with ner_tokens.json
([{"tokens": [...], "tags": [...]}, ...]) or ner_prepared.npz; synthetic in
smoke mode."""

from __future__ import annotations


import jax.numpy as jnp

from meant_tpu.cli.common import split_train_val_test, str2bool
from meant_tpu.cli.in_loop_genia import genia_parser, load_data
from meant_tpu.data import ArrayLoader
from meant_tpu.parallel import make_mesh
from meant_tpu.train.ner import TokenClassifier, ner_trainer


def tweet7_parser():
    p = genia_parser()
    # the reference uses argparse `type=bool` (any string truthy,
    # `tweet7.py:357`); repaired with str2bool per repo policy — crash
    # behavior (`--crf true` -> NotImplementedError) is preserved, but
    # `--crf false` now actually means False
    p.add_argument("-crf", "--crf", type=str2bool, nargs="?", const=True,
                   default=False, help="Conditional Random Field?")
    # repair flag (DEFECTS policy): the reference NEVER implemented the CRF
    # (its scratchpad `src/hug/e.py:67-71` shows the intended allennlp
    # BIO-constrained CRF); --crf --impl_crf runs the working
    # nn/crf.CRFTokenClassifier instead of raising
    p.add_argument("--impl_crf", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="use the implemented CRF head instead of the "
                        "reference-faithful NotImplementedError")
    p.add_argument("-lrwp", "--lr_warmup_step_ratio", type=float,
                   default=0.0,
                   help="Warmup ratio for our learning rate scheduler")
    # tweetner7 has 15 BIO tags (configs/roberta_tweet.json id2label) — the
    # genia_parser default of 9 (JNLPBA) would silently clamp tags 9-14 and
    # disable the CRF's BIO constraint mask on this harness's own dataset
    p.set_defaults(model_name="bert_ner", dataset="tweet7", num_classes=15)
    return p


def main(argv=None):
    args = tweet7_parser().parse_args(argv)
    if args.crf and not args.impl_crf:
        # faithful to the reference (`tweet7.py:391-392`)
        raise NotImplementedError("Conditional random fields not implemented")
    data = load_data(args)
    train, val, test = split_train_val_test(data)
    steps_per_epoch = max(len(train["labels"]) // args.train_batch_size, 1)
    total_steps = steps_per_epoch * args.num_epochs
    crf = args.crf and args.impl_crf
    if crf:
        from meant_tpu.cli.common import load_config
        from meant_tpu.nn.crf import (CRFTokenClassifier,
                                      bio_constraint_mask)
        model = CRFTokenClassifier(
            num_labels=args.num_classes, vocab_size=args.vocab_size,
            hidden_size=args.text_dim, num_layers=args.num_encoders,
            num_heads=args.num_heads, dropout=args.dropout,
            dtype=jnp.bfloat16 if args.bf16 else None)
        # BIO constraints from the tweetner7 label map (the tag set the
        # reference's scratchpad `src/hug/e.py:40-70` hardcodes)
        id2label = {int(k): v for k, v in
                    load_config("roberta_tweet")["id2label"].items()}
        if args.num_classes == len(id2label):
            constraint = bio_constraint_mask(id2label)
        else:
            constraint = None
            print(f"WARNING: --num_classes {args.num_classes} does not "
                  f"match the tweetner7 tag set ({len(id2label)} BIO tags), "
                  f"so the CRF runs WITHOUT the BIO transition constraint; "
                  f"viterbi may emit invalid O -> I-X sequences. Pass "
                  f"-nc {len(id2label)} for constrained decoding.")
    else:
        model = TokenClassifier(
            num_labels=args.num_classes, vocab_size=args.vocab_size,
            hidden_size=args.text_dim, num_layers=args.num_encoders,
            num_heads=args.num_heads, dropout=args.dropout,
            dtype=jnp.bfloat16 if args.bf16 else None)
        constraint = None
    trainer = ner_trainer({
        "crf": crf, "constraint_mask": constraint,
        "model": model, "model_name": args.model_name, "dataset": "tweet7",
        "train_data": ArrayLoader(train, args.train_batch_size,
                                  shuffle=True),
        "val_data": ArrayLoader(val, max(args.eval_batch_size,
                                         args.train_batch_size)),
        "epochs": args.num_epochs, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "optimizer": args.optimizer,
        "warmup_steps": int(total_steps * args.lr_warmup_step_ratio),
        "total_steps": total_steps,
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
