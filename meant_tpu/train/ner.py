"""Token-classification (NER) fine-tuning — rebuild of `checkpoint_train.py`
(epoch-per-job resumable NER fine-tune) and the `src/hug` NER experiments
(conll2003 / GENIA, `src/hug/in_loop_genia.py`).

Pieces:
  * align_labels: the reference's tokenize_and_align_labels label policy
    (`checkpoint_train.py:109-135`): special tokens -100, only the FIRST
    subword of each word labeled, continuations -100.
  * TokenClassifier: RoBERTa backbone + per-token head.
  * ner_trainer: CE with -100 ignore (shared with the MLM loss), per-epoch
    orbax checkpoint + --epoch resume (the SLURM job-chaining workflow of
    `checkpoint.sh:22-43`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from meant_tpu.nn.roberta import RobertaModel
from meant_tpu.data.masking import IGNORE_INDEX
from meant_tpu.train.pretrain import _BasePretrainer, mlm_loss


def ner_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """The reference NER loss CONVENTION (`src/hug/in_loop_genia.py:
    216-237`, `tweet7.py` same): CrossEntropy is computed PER EXAMPLE
    (torch's mean over that example's non--100 tokens), collected into
    batch_loss, then averaged as sum(batch_loss)/batch_size. This differs
    from one flat mean over all valid tokens (mlm_loss) whenever examples
    carry different label counts — which subword alignment guarantees.
    Empty rows (no labeled token) produce nan in torch; guarded to 0 here
    (alignment always labels the first subword, so the case is synthetic).
    """
    logits = logits.astype(jnp.float32)
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1).squeeze(-1)
    row_sum = jnp.sum(nll * valid, axis=-1)
    row_cnt = jnp.sum(valid, axis=-1)
    row_mean = jnp.where(row_cnt > 0, row_sum / jnp.maximum(row_cnt, 1), 0.0)
    return jnp.mean(row_mean)


def align_labels(word_ids_batch: Sequence[Sequence[Optional[int]]],
                 word_labels_batch: Sequence[Sequence[int]],
                 ignore_index: int = -100) -> np.ndarray:
    """Map word-level NER tags onto subword tokens
    (`checkpoint_train.py:115-135`): None (special) -> -100; first subword of
    a word -> its tag; continuation subwords -> -100."""
    out = []
    for word_ids, labels in zip(word_ids_batch, word_labels_batch):
        prev = None
        row = []
        for w in word_ids:
            if w is None:
                row.append(ignore_index)
            elif w != prev:
                row.append(labels[w])
            else:
                row.append(ignore_index)
            prev = w
        out.append(row)
    return np.asarray(out, np.int32)


class TokenClassifier(nn.Module):
    """RoBERTa backbone + token-classification head (the TPU-native
    equivalent of AutoModelForTokenClassification in the reference)."""
    num_labels: int
    vocab_size: int = 64001
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 deterministic: bool = True):
        hidden = RobertaModel(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            intermediate_size=4 * self.hidden_size, dropout=self.dropout,
            dtype=self.dtype, name="roberta")(
                input_ids, attention_mask, deterministic=deterministic,
                return_pooled=False)
        hidden = nn.Dropout(self.dropout, name="drop")(
            hidden, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=self.dtype,
                        name="classifier")(hidden)


class ner_trainer(_BasePretrainer):
    """Batches: input_ids (b, s), attention_mask (b, s), labels (b, s) with
    -100 on unlabeled positions. Loss/early-stop semantics shared with the
    pretrainer base (val-loss patience).

    crf=True drives a `nn.crf.CRFTokenClassifier`: loss is the CRF NLL and
    token_f1 decodes with constrained viterbi (pass `constraint_mask` from
    `bio_constraint_mask`) — the repaired tweet7 --crf path (the reference
    raises NotImplementedError, `src/hug/tweet7.py:391-392`).

    Loss/optimizer conventions match the reference loop exactly
    (trajectory-parity tested, tests/test_vqa_ner_parity.py): per-example
    CE averaged as sum/batch_size (ner_ce_loss; `flat_token_mean=True`
    opts into the flat all-valid-tokens mean instead) and NO gradient
    clipping (`in_loop_genia.py:237-240` steps unclipped; pass clip_norm
    to override)."""
    kind = "ner"

    def __init__(self, p):
        self.crf = p.get("crf", False)
        self.constraint_mask = p.get("constraint_mask")
        self.flat_token_mean = p.get("flat_token_mean", False)
        p = dict(p)
        p.setdefault("clip_norm", None)
        super().__init__(p)

    def _init_variables(self, rng, batch):
        args = [jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["attention_mask"])]
        if self.crf:
            args.append(jnp.asarray(batch["labels"]))
        return self.model.init({"params": rng, "dropout": rng}, *args)

    def _apply(self, params, batch, deterministic, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        args = [batch["input_ids"], batch["attention_mask"]]
        if self.crf:
            args.append(batch["labels"])  # -> (logits, nll)
        return self.model.apply({"params": params}, *args,
                                deterministic=deterministic, rngs=rngs)

    def _loss(self, out, batch):
        if self.crf:
            return out[1]
        if self.flat_token_mean:
            return mlm_loss(out, batch["labels"])
        return ner_ce_loss(out, batch["labels"])

    def token_f1(self, loader, num_labels: int):
        """Macro F1 over labeled (non--100) tokens; CRF models predict via
        (constrained) viterbi decode instead of per-token argmax."""
        from meant_tpu.utils.metrics import metrics_from_confusion
        cm = np.zeros((num_labels, num_labels), np.int64)
        for batch in loader:
            db = {k: jnp.asarray(v) for k, v in batch.items()}
            if self.crf:
                preds, _ = self.model.apply(
                    {"params": self.state.params}, db["input_ids"],
                    db["attention_mask"],
                    constraint_mask=self.constraint_mask,
                    method=type(self.model).decode)
                preds = np.asarray(preds)
            else:
                preds = np.asarray(
                    self._apply(self.state.params, db, True)).argmax(-1)
            labels = np.asarray(batch["labels"])
            valid = labels != -100
            for t, p in zip(labels[valid].ravel(), preds[valid].ravel()):
                cm[t, p] += 1
        return metrics_from_confusion(cm)


def join_examples(tokens_list, tags_list, join_size: int):
    """`join_examples` (`src/hug/in_loop_genia.py:101-115`,
    `src/hug/tweet7.py:106-120`): concatenate each group of `join_size`
    consecutive examples into one training example (more non-O tags per
    example). QUIRK replicated: the reference concatenates group-RELATIVE
    indices 0..join_size-1 of the SLICE it was handed — callers here pass
    per-group slices, which is the behavior the reference achieves when
    join_size == slice length."""
    out_tokens, out_tags = [], []
    n = len(tokens_list)
    for i in range(0, n - join_size + 1, join_size):
        toks = list(tokens_list[i])
        tags = list(tags_list[i])
        for x in range(1, join_size):
            toks += list(tokens_list[i + x])
            tags += list(tags_list[i + x])
        out_tokens.append(toks)
        out_tags.append(tags)
    return out_tokens, out_tags
