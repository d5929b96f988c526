"""RoBERTa-style embeddings (linen).

The reference models take a pretrained HF embedding module as a constructor
argument (`bertweet.embeddings`, `in_loop_train.py:440,493`) and run it as
their first stage (`meant/meant.py:211-212`). This is the TPU-native
equivalent: a RoBERTa embedding stack (word + position + token-type +
LayerNorm + dropout) whose tables are either random-init (bertweet-base
geometry by default: vocab 64001, max positions 130, pad_id 1) or imported
from a torch state_dict via meant_tpu.utils.port.

Position ids follow RoBERTa's convention: pad tokens get position
`padding_idx`; real tokens get `padding_idx + running count` (HF
`create_position_ids_from_input_ids`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class RobertaEmbeddings(nn.Module):
    vocab_size: int = 64001          # vinai/bertweet-base
    hidden_size: int = 768
    max_position_embeddings: int = 130
    type_vocab_size: int = 1
    padding_idx: int = 1
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        # setup-style (not @nn.compact) so `attend` can reuse the word table
        # for a TIED LM decoder: HF RobertaForMaskedLM shares
        # lm_head.decoder.weight with the embedding matrix, and the
        # reference MLM pretrainer inherits that tie (`pretrain_mlm.py:
        # 317-320` assembles from RobertaForMaskedLM._from_config)
        self.word_embeddings = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (self.vocab_size, self.hidden_size))
        self.position_embeddings = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_position_embeddings, self.hidden_size))
        self.token_type_embeddings = self.param(
            "token_type_embeddings", nn.initializers.normal(0.02),
            (self.type_vocab_size, self.hidden_size))
        self.ln_scale = self.param("ln_scale", nn.initializers.ones,
                                   (self.hidden_size,))
        self.ln_bias = self.param("ln_bias", nn.initializers.zeros,
                                  (self.hidden_size,))
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, input_ids, token_type_ids=None,
                 deterministic: bool = True):
        mask = (input_ids != self.padding_idx).astype(jnp.int32)
        position_ids = jnp.cumsum(mask, axis=-1) * mask + self.padding_idx
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        x = (self.word_embeddings[input_ids]
             + self.position_embeddings[position_ids]
             + self.token_type_embeddings[token_type_ids])
        from meant_tpu.ops import layer_norm
        x = layer_norm(x, self.ln_scale, self.ln_bias,
                       eps=self.layer_norm_eps)
        x = self.drop(x, deterministic=deterministic)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return x

    def attend(self, x):
        """(…, hidden) -> (…, vocab) through the TRANSPOSED word table —
        the tied-decoder read-out. One parameter, so the gradient sums over
        both uses and the optimizer keeps one slot, exactly like torch's
        shared tensor."""
        table = self.word_embeddings
        if self.dtype is not None:
            x = x.astype(self.dtype)
            table = table.astype(self.dtype)
        return x @ table.T
