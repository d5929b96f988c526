"""HF RoBERTa state_dict -> RobertaModel params: build a small torch
RobertaModel via transformers, port its weights, compare hidden states."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from meant_tpu.nn.roberta import RobertaModel
from meant_tpu.utils import port


def make_hf_roberta():
    from transformers import RobertaConfig, RobertaModel as TorchRoberta
    cfg = RobertaConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    return TorchRoberta(cfg).eval(), cfg


def test_hf_roberta_port_hidden_state_parity():
    tmodel, cfg = make_hf_roberta()
    sd = {f"roberta.{k}": v for k, v in tmodel.state_dict().items()}
    params = port.import_hf_roberta(sd, num_layers=2, num_heads=4)

    jmodel = RobertaModel(vocab_size=64, hidden_size=32, num_layers=2,
                          num_heads=4, intermediate_size=64,
                          max_position_embeddings=40, dropout=0.0)
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 64, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.float32)
    mask[:, 7:] = 0
    ids[:, 7:] = 1

    hidden_j, pooled_j = jmodel.apply({"params": params}, jnp.asarray(ids),
                                      jnp.asarray(mask))
    with torch.no_grad():
        out = tmodel(input_ids=torch.tensor(ids).long(),
                     attention_mask=torch.tensor(mask))
    np.testing.assert_allclose(np.asarray(hidden_j),
                               out.last_hidden_state.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled_j),
                               out.pooler_output.numpy(),
                               rtol=1e-3, atol=2e-4)
