"""hug-suite MLM pretraining — named equivalent of
`src/hug/pretrain_mlm.py` (RoBERTa built from a JSON config wrapped by
hug_roberta_mlm_wrapper, trained with the reference's degenerate loss).

DOCUMENTED QUIRK replicated: the wrapper outputs one SCALAR per token
(b, s) and the reference applies `nn.CrossEntropyLoss()(out,
labels.float())` — torch's soft-target mode over the SEQUENCE axis with
raw masked-label ids (-100 included) as the "target distribution"
(`src/hug/pretrain_mlm.py:185,206`). Numerically runnable, semantically
meaningless; `--fixed_loss true` masks to a real MSE-on-masked-positions
objective instead (repair, off by default for parity).

Flag names follow `src/hug/pretrain_mlm.py:239-270` (-b/--batch_size,
-dn/--dataset_name, -s/--stoppage, -cl/--cache_location)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from meant_tpu.cli.common import base_parser, str2bool, reject_stack_flags
from meant_tpu.cli.pretrain_mlm import load_text
from meant_tpu.data import ArrayLoader, hash_tokenize
from meant_tpu.data.masking import mask_tokens
from meant_tpu.parallel import make_mesh
from meant_tpu.train.pretrain import _BasePretrainer


def hug_parser():
    # base_parser already carries the shared hug flags (-s, -cl, ...)
    p = base_parser()
    p.add_argument("-b", "--batch_size", type=int, default=16)
    p.add_argument("-dn", "--dataset_name", type=str, default="stmhd")
    p.add_argument("--fixed_loss", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="masked-position MSE instead of the reference's "
                        "soft-target sequence-axis CE")
    p.set_defaults(model_name="roberta_mlm")
    return p


class hug_mlm_pretrainer(_BasePretrainer):
    kind = "hug_mlm"

    def __init__(self, p):
        super().__init__(p)
        self.fixed_loss = p.get("fixed_loss", False)

    def _init_variables(self, rng, batch):
        return self.model.init({"params": rng, "dropout": rng},
                               jnp.asarray(batch["input_ids"]),
                               jnp.asarray(batch["attention_mask"]))

    def _apply(self, params, batch, deterministic, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        return self.model.apply({"params": params}, batch["input_ids"],
                                batch["attention_mask"],
                                deterministic=deterministic, rngs=rngs)

    def _loss(self, out, batch):
        target = batch["labels"].astype(jnp.float32)
        if self.fixed_loss:
            # repair: MSE between the scalar head and the masked token ids,
            # on masked positions only
            valid = (batch["labels"] != -100).astype(jnp.float32)
            err = (out.astype(jnp.float32) - target) ** 2 * valid
            return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1.0)
        # reference quirk: CE soft-target mode over the SEQUENCE axis with
        # the raw label ids (incl. -100) as the "distribution"
        logp = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
        return jnp.mean(-jnp.sum(target * logp, axis=-1))


def main(argv=None):
    args = hug_parser().parse_args(argv)
    reject_stack_flags(args, "hug_pretrain_mlm")
    texts = load_text(args)
    vocab_size, pad_id = args.vocab_size, 1
    mask_id = vocab_size - 1
    tok = hash_tokenize(vocab_size - 2, args.seq_len)
    ids = np.full((len(texts), args.seq_len), pad_id, np.int32)
    for i, t in enumerate(texts):
        enc = tok(t)[: args.seq_len]
        ids[i, : len(enc)] = enc
    inputs, labels = mask_tokens(ids, mask_token_id=mask_id,
                                 special_ids=[0, 1, 2],
                                 seed=int(args.run_id
                                          if str(args.run_id).isdigit()
                                          else 0))
    mask = (ids != pad_id).astype(np.float32)
    data = {"input_ids": inputs, "labels": labels, "attention_mask": mask}
    n_val = max(len(texts) // 10, 1)
    train = {k: v[n_val:] for k, v in data.items()}
    val = {k: v[:n_val] for k, v in data.items()}

    from meant_tpu.nn.roberta import hug_roberta_mlm_wrapper
    model = hug_roberta_mlm_wrapper(
        input_dim=args.text_dim, vocab_size=vocab_size,
        num_layers=args.num_encoders, num_heads=args.num_heads,
        dtype=jnp.bfloat16 if args.bf16 else None)
    trainer = hug_mlm_pretrainer({
        "model": model, "model_name": args.model_name,
        "dataset": args.dataset_name, "fixed_loss": args.fixed_loss,
        "train_data": ArrayLoader(train, args.batch_size, shuffle=True),
        "val_data": ArrayLoader(val, args.batch_size),
        "epochs": args.num_epochs, "lr": args.learning_rate,
        "decay": args.decay, "beta_1": args.beta_1, "beta_2": args.beta_2,
        "lrst": args.learning_rate_scheduler_type, "t0": args.t0,
        "tmax": args.tmax, "optimizer": args.optimizer,
        "file_path": args.file_path, "run_id": args.run_id,
        "num_encoders": args.num_encoders, "track": args.track,
        "mesh": make_mesh(),
    })
    hist = trainer.train()
    return hist


if __name__ == "__main__":
    main()
