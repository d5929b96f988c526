"""Linear-chain Conditional Random Field (repair of a reference stub).

The reference's tweet7 harness raises ``NotImplementedError`` for ``--crf``
(`src/hug/tweet7.py:391-392`); its scratchpad `src/hug/e.py:67-71` shows the
intent — allennlp's ``ConditionalRandomField`` with BIO
``allowed_transitions`` over the tweetner7 tag set. Per the repo's defect
policy (DEFECTS.md: replicate crashes by default, repair behind flags) the
crash stays the tweet7 default and this working CRF ships behind
``--impl_crf``.

Semantics follow allennlp (the library the reference reached for):

  * score(x, y) = start[y_0] + sum_t emis[t, y_t] + sum_t trans[y_t, y_{t+1}]
    + end[y_T]; loss = -(score - logZ), mean over the batch;
  * the partition runs a forward (logsumexp) recursion — here a `lax.scan`
    over time, vectorized over (batch, tags) so the VPU sees (b, T, T)
    blocks rather than Python loops;
  * mask handling matches allennlp: masked steps contribute no emission and
    no transition — alpha / the gold path carry through them, so interior
    masked positions (sub-word continuations labeled -100) chain their
    neighbors directly;
  * BIO transition constraints apply at DECODE time only (allennlp applies
    `constraint_mask` in `viterbi_tags`, not in the training loss).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from flax import linen as nn

NEG = -1e4  # allennlp uses -10000 for disallowed transitions


def bio_constraint_mask(id2label: Dict[int, str]) -> np.ndarray:
    """(T+2, T+2) boolean: [from, to] allowed under BIO. Virtual START is
    index T, END is T+1 (allennlp `allowed_transitions` convention).

    Rules: anything may go to O or B-X; I-X only follows B-X or I-X of the
    SAME entity type; START may open O/B-X; anything may close to END.
    """
    T = len(id2label)
    allowed = np.zeros((T + 2, T + 2), bool)
    START, END = T, T + 1

    def kind(i):
        lab = id2label[i]
        if lab == "O":
            return "O", None
        prefix, _, ent = lab.partition("-")
        return prefix, ent

    for i in range(T):
        ki, ei = kind(i)
        # from START
        if ki in ("O", "B"):
            allowed[START, i] = True
        # to END
        allowed[i, END] = True
        for j in range(T):
            kj, ej = kind(j)
            if kj in ("O", "B"):
                allowed[i, j] = True
            elif kj == "I":
                allowed[i, j] = (ki in ("B", "I")) and (ei == ej)
    return allowed


class CRF(nn.Module):
    """Transitions are PARAMS; emissions come from the token classifier."""
    num_tags: int

    def setup(self):
        init = nn.initializers.normal(0.02)
        self.transitions = self.param("transitions", init,
                                      (self.num_tags, self.num_tags))
        self.start_transitions = self.param("start_transitions", init,
                                            (self.num_tags,))
        self.end_transitions = self.param("end_transitions", init,
                                          (self.num_tags,))

    def __call__(self, emissions, tags, mask=None):
        return self.neg_log_likelihood(emissions, tags, mask)

    # ---- training loss --------------------------------------------------
    def neg_log_likelihood(self, emissions: jnp.ndarray, tags: jnp.ndarray,
                           mask: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
        """emissions (b, s, T) fp; tags (b, s) int; mask (b, s) {0,1}
        (0 also where tags == -100). Mean NLL over the batch."""
        emissions = emissions.astype(jnp.float32)
        if mask is None:
            mask = jnp.ones(tags.shape, jnp.float32)
        mask = mask.astype(jnp.float32) * (tags != -100)
        tags = jnp.where(tags == -100, 0, tags)  # safe gather index
        logZ = self._partition(emissions, mask)
        gold = self._path_score(emissions, tags, mask)
        return jnp.mean(logZ - gold)

    def _partition(self, emissions, mask):
        b = emissions.shape[0]
        trans = self.transitions.astype(jnp.float32)

        def step(carry, xs):
            alpha, started = carry
            emis_t, m_t = xs                       # (b, T), (b,)
            m = m_t[:, None]
            first = (1.0 - started)[:, None] * m   # this step opens the seq
            cont = started[:, None] * m            # normal recursion step
            # recursion: logsumexp over previous tag
            nxt = jax.nn.logsumexp(alpha[:, :, None] + trans[None], axis=1)
            opened = self.start_transitions.astype(jnp.float32)[None] \
                + emis_t
            alpha = first * opened + cont * (nxt + emis_t) \
                + (1.0 - m) * alpha
            started = jnp.maximum(started, m_t)
            return (alpha, started), None

        alpha0 = jnp.zeros((b, self.num_tags), jnp.float32)
        (alpha, started), _ = lax.scan(
            step, (alpha0, jnp.zeros((b,), jnp.float32)),
            (emissions.transpose(1, 0, 2), mask.T))
        final = alpha + self.end_transitions.astype(jnp.float32)[None]
        # a fully-masked row contributes 0 (gold score is 0 there too)
        return jnp.where(started > 0, jax.nn.logsumexp(final, axis=1), 0.0)

    def _path_score(self, emissions, tags, mask):
        b = emissions.shape[0]
        trans = self.transitions.astype(jnp.float32)
        start = self.start_transitions.astype(jnp.float32)

        def step(carry, xs):
            score, prev, started = carry
            emis_t, tag_t, m_t = xs
            e = jnp.take_along_axis(emis_t, tag_t[:, None], 1)[:, 0]
            first = (1.0 - started) * m_t
            cont = started * m_t
            score = score + first * (start[tag_t] + e) \
                + cont * (trans[prev, tag_t] + e)
            prev = jnp.where(m_t > 0, tag_t, prev)
            started = jnp.maximum(started, m_t)
            return (score, prev, started), None

        (score, last, started), _ = lax.scan(
            step, (jnp.zeros((b,), jnp.float32),
                   jnp.zeros((b,), jnp.int32),
                   jnp.zeros((b,), jnp.float32)),
            (emissions.transpose(1, 0, 2), tags.T.astype(jnp.int32),
             mask.T))
        end = self.end_transitions.astype(jnp.float32)
        return score + jnp.where(started > 0, end[last], 0.0)

    # ---- decode ---------------------------------------------------------
    def viterbi(self, emissions: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None,
                constraint_mask: Optional[np.ndarray] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Best tag path. Returns (tags (b, s) int32, score (b,)).
        Masked positions repeat the previous unmasked tag (callers index by
        mask anyway). constraint_mask: (T+2, T+2) bool from
        `bio_constraint_mask` — applied here only, as in allennlp."""
        emissions = emissions.astype(jnp.float32)
        b, s, T = emissions.shape
        if mask is None:
            mask = jnp.ones((b, s), jnp.float32)
        mask = mask.astype(jnp.float32)
        trans = self.transitions.astype(jnp.float32)
        start = self.start_transitions.astype(jnp.float32)
        end = self.end_transitions.astype(jnp.float32)
        if constraint_mask is not None:
            cm = jnp.asarray(constraint_mask)
            trans = jnp.where(cm[:T, :T], trans, NEG)
            start = jnp.where(cm[T, :T], start, NEG)
            end = jnp.where(cm[:T, T + 1], end, NEG)

        def fwd(carry, xs):
            alpha, started = carry
            emis_t, m_t = xs
            m = m_t[:, None]
            scores = alpha[:, :, None] + trans[None]       # (b, T_prev, T)
            bp = jnp.argmax(scores, axis=1).astype(jnp.int32)
            nxt = jnp.max(scores, axis=1) + emis_t
            first = (1.0 - started)[:, None] * m
            cont = started[:, None] * m
            alpha = first * (start[None] + emis_t) + cont * nxt \
                + (1.0 - m) * alpha
            # masked/opening steps have no real backpointer: identity
            iota = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                    (b, T))
            bp = jnp.where((cont > 0), bp, iota)
            started = jnp.maximum(started, m_t)
            return (alpha, started), bp

        alpha0 = jnp.full((b, T), 0.0, jnp.float32)
        (alpha, _), bps = lax.scan(
            fwd, (alpha0, jnp.zeros((b,), jnp.float32)),
            (emissions.transpose(1, 0, 2), mask.T))
        final = alpha + end[None]
        best_last = jnp.argmax(final, axis=1).astype(jnp.int32)
        best_score = jnp.max(final, axis=1)

        def back(tag, bp):
            prev = jnp.take_along_axis(bp, tag[:, None], 1)[:, 0]
            return prev, tag

        _, path = lax.scan(back, best_last, bps, reverse=True)
        return path.T, best_score                         # (b, s), (b,)


class CRFTokenClassifier(nn.Module):
    """TokenClassifier backbone + CRF head — the repaired `--crf true`
    path for the tweet7/NER harnesses. `__call__(..., tags=...)` returns
    (logits, nll); without tags it returns logits; `decode` runs
    constrained viterbi (pass `bio_constraint_mask(id2label)`)."""
    num_labels: int
    vocab_size: int = 64001
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        from meant_tpu.train.ner import TokenClassifier
        self.encoder = TokenClassifier(
            num_labels=self.num_labels, vocab_size=self.vocab_size,
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads, dropout=self.dropout,
            dtype=self.dtype, name="token_classifier")
        self.crf = CRF(self.num_labels, name="crf")

    def __call__(self, input_ids, attention_mask=None, tags=None,
                 deterministic: bool = True):
        logits = self.encoder(input_ids, attention_mask,
                              deterministic=deterministic)
        if tags is None:
            return logits
        return logits, self.crf.neg_log_likelihood(logits, tags,
                                                   attention_mask)

    def decode(self, input_ids, attention_mask=None, constraint_mask=None):
        logits = self.encoder(input_ids, attention_mask,
                              deterministic=True)
        return self.crf.viterbi(logits, attention_mask,
                                constraint_mask=constraint_mask)
