"""Training-trajectory equivalence for the VQA and NER loops (VERDICT r3
#5) — finishing the conversion of ALL loss conventions from "logits match
at t=0" to "training matches".

VQA: the torch side is the ACTUAL reference `meant_vqa` driven by the
reference vqa_trainer loop (`/root/reference/vqa.py:193-224` minus AMP):
zero_grad -> forward -> CrossEntropyLoss against SOFT targets -> backward
-> clip_grad_norm_(1.0) -> step, per-epoch CosineAnnealingWarmRestarts.
The meant_tpu side runs the production jitted `train/vqa.vqa_trainer`
step.

NER: the torch side is HF RobertaForTokenClassification driven by the hug
NER loop (`/root/reference/src/hug/in_loop_genia.py:216-246` minus AMP):
CE computed PER EXAMPLE, averaged as sum/batch_size, NO gradient clipping.
The meant_tpu side runs `train/ner.ner_trainer` (which defaults to exactly
that convention — ner_ce_loss + clip_norm=None). The synthetic labels
carry DIFFERENT valid-token counts per row, so a flat all-tokens mean
would measurably diverge — the convention itself is under test.

Skipped when /root/reference is not mounted.
"""

import os

import numpy as np
import pytest

import torch
from torch import nn

import test_reference_parity as trp

REF = "/root/reference"

pytestmark = [
    pytest.mark.heavy,  # torch reference training oracle
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "meant")),
        reason="reference snapshot not mounted"),
]

B, EPOCHS = 8, 6   # 6 epochs x 2 batches = 12 optimizer steps


def _check(torch_losses, tpu_losses, tol=5e-4):
    assert len(torch_losses) == len(tpu_losses) == EPOCHS * 2
    diffs = [abs(a - b) for a, b in zip(torch_losses, tpu_losses)]
    assert max(diffs) <= tol, (
        f"trajectories diverged: per-step loss diffs {diffs}")
    assert torch_losses[-1] < torch_losses[0]
    assert tpu_losses[-1] < tpu_losses[0]


def test_vqa_training_trajectory_matches_torch_reference():
    trp._install_stubs()
    from meant.meant_vqa import meant_vqa as ref_model
    from transformers import RobertaConfig
    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings

    torch.manual_seed(9)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    n_classes = 7
    ref = ref_model(text_dim=768, image_dim=768, price_dim=4, height=32,
                    width=32, patch_res=16, lag=1, num_classes=n_classes,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=8, num_encoders=1, channels=4)
    for m in ref.modules():        # protocol: dropout off on both sides
        if isinstance(m, nn.Dropout):
            m.p = 0.0
    ref.train()
    sd = {k: v.clone() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(9)
    n, s = 16, 16
    tweets = rng.randint(2, 100, size=(n, s)).astype(np.int64)
    images = (rng.randn(n, 4, 32, 32) * 0.5).astype(np.float32)
    mask = np.ones((n, s), np.float32)
    # VQA-v2 soft scores: min(1, count/3) — sparse, NOT normalized to 1
    soft = np.zeros((n, n_classes), np.float32)
    for i in range(n):
        for j in rng.choice(n_classes, size=2, replace=False):
            soft[i, j] = min(1.0, rng.randint(1, 5) / 3.0)

    # ---- torch reference loop (vqa.py:193-224 minus AMP) ----
    lr = 1e-4
    opt = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=0.0,
                            betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=7)
    ce = nn.CrossEntropyLoss()   # soft (probabilistic) targets
    torch_losses = []
    for _ in range(EPOCHS):
        for i in range(0, n, B):
            opt.zero_grad()
            out = ref(torch.tensor(tweets[i:i + B]),
                      torch.tensor(images[i:i + B]),
                      torch.tensor(mask[i:i + B]))
            loss = ce(out, torch.tensor(soft[i:i + B]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
            opt.step()
            torch_losses.append(float(loss.detach()))
        sched.step()

    # ---- meant_tpu: the production jitted vqa_trainer step ----
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant_vqa as tpu_model
    from meant_tpu.train.vqa import vqa_trainer
    from meant_tpu.utils import port

    params = port.import_meant_vqa(sd, num_encoders=1)
    model = tpu_model(text_dim=768, image_dim=768, price_dim=4, height=32,
                      width=32, patch_res=16, lag=1, num_classes=n_classes,
                      embedding=EmbeddingConfig(
                          vocab_size=100, hidden_size=768,
                          max_position_embeddings=40, dropout=0.0),
                      num_heads=8, num_encoders=1, channels=4,
                      ff_dropout=0.0)
    loader = ArrayLoader({"language_input_ids": tweets.astype(np.int32),
                          "pixel_values": images, "attention_mask": mask,
                          "labels": soft}, B)
    tr = vqa_trainer({
        "model": model, "model_name": "meant_vqa", "train_loader": loader,
        "epochs": EPOCHS, "num_classes": n_classes, "lr": lr,
        "lrst": "cosine_warm", "t0": 7, "test_model": False,
        "init_params": params, "run_id": "parity"})
    tr._init_state(next(iter(loader)))
    tr._build_steps()
    tpu_losses = []
    for _ in range(EPOCHS):
        for batch in loader:
            db = tr._device_batch(batch)
            tr.state, loss, _ = tr._jit_train(tr.state, db)
            tpu_losses.append(float(loss))
    _check(torch_losses, tpu_losses)


def test_ner_training_trajectory_matches_torch_reference():
    from transformers import RobertaConfig, RobertaForTokenClassification

    torch.manual_seed(10)
    n_labels, layers, heads, hidden = 5, 2, 4, 64
    cfg = RobertaConfig(vocab_size=100, hidden_size=hidden,
                        num_hidden_layers=layers, num_attention_heads=heads,
                        intermediate_size=4 * hidden,
                        # meant_tpu RobertaModel's bertweet default
                        max_position_embeddings=130, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        classifier_dropout=0.0, num_labels=n_labels,
                        layer_norm_eps=1e-5)
    ref = RobertaForTokenClassification(cfg)
    ref.train()
    sd = {k: v.clone() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(10)
    n, s = 16, 16
    ids = rng.randint(4, 100, size=(n, s)).astype(np.int64)
    mask = np.ones((n, s), np.float32)
    labels = np.full((n, s), -100, np.int64)
    for i in range(n):
        # DIFFERENT valid counts per row: the per-example-mean vs
        # flat-token-mean conventions must actually differ on this data
        k = rng.randint(3, 12)
        pos = rng.choice(np.arange(1, s - 1), size=k, replace=False)
        labels[i, pos] = rng.randint(0, n_labels, size=k)

    # ---- torch hug NER loop (in_loop_genia.py:216-246 minus AMP) ----
    lr = 1e-4
    opt = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=0.0,
                            betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=7)
    ce = nn.CrossEntropyLoss()   # ignore_index=-100
    torch_losses = []
    for _ in range(EPOCHS):
        for i in range(0, n, B):
            opt.zero_grad()
            out = ref(input_ids=torch.tensor(ids[i:i + B]),
                      attention_mask=torch.tensor(mask[i:i + B])).logits
            batch_loss = [ce(out[j], torch.tensor(labels[i + j]))
                          for j in range(B)]      # PER-EXAMPLE CE
            avg = sum(batch_loss) / B
            avg.backward()                         # NO clipping
            opt.step()
            torch_losses.append(float(avg.detach()))
        sched.step()

    # ---- meant_tpu: the production jitted ner_trainer step ----
    from meant_tpu.data import ArrayLoader
    from meant_tpu.train.ner import TokenClassifier, ner_trainer
    from meant_tpu.utils import port
    from meant_tpu.utils.port import _t

    params = {
        "roberta": port.import_hf_roberta(sd, layers, heads),
        "classifier": {"kernel": _t(sd["classifier.weight"]).T,
                       "bias": _t(sd["classifier.bias"])},
    }
    model = TokenClassifier(num_labels=n_labels, vocab_size=100,
                            hidden_size=hidden, num_layers=layers,
                            num_heads=heads, dropout=0.0)
    loader = ArrayLoader({"input_ids": ids.astype(np.int32),
                          "attention_mask": mask,
                          "labels": labels.astype(np.int32)}, B)
    tr = ner_trainer({
        "model": model, "model_name": "bert_ner", "train_data": loader,
        "epochs": EPOCHS, "lr": lr, "lrst": "cosine_warm", "t0": 7,
        "init_params": params, "run_id": "parity"})
    import jax
    import jax.numpy as jnp

    from meant_tpu.parallel import shard_batch

    tr._init_state(next(iter(loader)))
    tr._build_steps()
    tpu_losses = []
    for _ in range(EPOCHS):
        for batch in loader:
            db = shard_batch(jax.tree.map(jnp.asarray, dict(batch)),
                             tr.mesh)
            tr.state, loss = tr._jit_train(tr.state, db)
            tpu_losses.append(float(loss))
    _check(torch_losses, tpu_losses)

    # and the convention really is load-bearing on this data: the flat
    # token mean measurably disagrees with the per-example mean
    from meant_tpu.train.ner import ner_ce_loss
    from meant_tpu.train.pretrain import mlm_loss
    logits = rng.randn(B, s, n_labels).astype(np.float32)
    lab = jnp.asarray(labels[:B].astype(np.int32))
    a = float(ner_ce_loss(jnp.asarray(logits), lab))
    b = float(mlm_loss(jnp.asarray(logits), lab))
    assert abs(a - b) > 1e-3
