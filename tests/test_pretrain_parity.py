"""Cross-framework TRAINING-TRAJECTORY equivalence for the PRETRAINING
harness family (VERDICT r3 #1c) — the MLM/MIM twin of
test_training_parity.py.

Protocol: build the ACTUAL torch reference pretrainers
(`/root/reference/pretrain_mlm.py:74-88`, `pretrain_mim.py:77-99`), port
their init into meant_tpu (`utils/port.import_language_pretrainer` /
`import_vision_pretrainer`), train BOTH on identical synthetic masked data —
same batch order, AdamW + per-epoch CosineAnnealingWarmRestarts(T_0=7) (the
reference defaults), grad-clip 1.0, dropout zeroed, fp32 CPU — and assert
per-step losses track.

The torch side replicates the reference loops minus AMP
(`pretrain_mlm.py:171-196`: zero_grad -> forward -> CE over vocab with the
-100 ignore_index -> backward -> clip_grad_norm_(1.0) -> step;
`pretrain_mim.py:196-211`: same skeleton with plain nn.L1Loss against
labels that still CARRY the -100 markers — DEFECTS #30, replicated by the
default mim loss). The meant_tpu side runs the REAL jitted production
pretrain step (`train/pretrain._BasePretrainer._jit_train` — the same step
bench.py --workload mlm/mim times).

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


def _drive_tpu(pretrainer, loader, epochs):
    """Per-step losses from the production jitted pretrain step (train()
    aggregates per-epoch; trajectory equivalence needs each step)."""
    import jax
    import jax.numpy as jnp

    from meant_tpu.parallel import shard_batch

    pretrainer._init_state(next(iter(loader)))
    pretrainer._build_steps()
    losses = []
    for _ in range(epochs):
        for batch in loader:
            db = shard_batch(jax.tree.map(jnp.asarray, dict(batch)),
                             pretrainer.mesh)
            pretrainer.state, loss = pretrainer._jit_train(pretrainer.state,
                                                           db)
            losses.append(float(loss))
    return losses


def _assert_trajectories_match(torch_losses, tpu_losses, tol=5e-4):
    assert len(torch_losses) == len(tpu_losses) == EPOCHS * 2
    diffs = [abs(a - b) for a, b in zip(torch_losses, tpu_losses)]
    assert max(diffs) <= tol, (
        f"pretraining trajectories diverged: per-step loss diffs {diffs}")
    assert torch_losses[-1] < torch_losses[0]
    assert tpu_losses[-1] < tpu_losses[0]


def test_mlm_training_trajectory_matches_torch_reference():
    trp._stub_pretrain_datasets()
    from pretrain_mlm import meant_language_pretrainer as ref_pre
    from transformers import RobertaConfig, RobertaForMaskedLM

    torch.manual_seed(5)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        num_hidden_layers=1, num_attention_heads=8,
                        intermediate_size=64, layer_norm_eps=1e-5)
    bertweet = RobertaForMaskedLM(cfg)
    ref = ref_pre(1, 768, bertweet.roberta.embeddings, bertweet.lm_head)
    for m in ref.modules():        # protocol: dropout off on both sides
        if isinstance(m, nn.Dropout):
            m.p = 0.0
    ref.train()
    sd = {k: v.clone() for k, v in ref.state_dict().items()}

    from meant_tpu.data.masking import mask_tokens
    rng = np.random.RandomState(5)
    n, s = 16, 16
    ids = rng.randint(4, 100, size=(n, s))
    inputs, labels = mask_tokens(ids, mask_token_id=3, special_ids=[0, 1, 2],
                                 seed=6)
    mask = np.ones((n, s), np.float32)

    # ---- torch reference loop (pretrain_mlm.py:171-196 minus AMP) ----
    lr = 1e-4
    opt = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=0.0,
                            betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=7)
    ce = nn.CrossEntropyLoss()   # ignore_index=-100, the reference default
    torch_losses = []
    for _ in range(EPOCHS):
        for i in range(0, n, B):
            opt.zero_grad()
            out = ref(torch.tensor(inputs[i:i + B]),
                      torch.tensor(mask[i:i + B]))
            loss = ce(out.view(-1, 100),
                      torch.tensor(labels[i:i + B]).view(-1))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
            opt.step()
            torch_losses.append(float(loss.detach()))
        sched.step()   # per-EPOCH, pretrain_mlm.py:199

    # ---- meant_tpu: the production jitted pretrain step ----
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.pretrainers import meant_language_pretrainer
    from meant_tpu.train.pretrain import mlm_pretrainer
    from meant_tpu.utils import port

    params = port.import_language_pretrainer(sd, 1)
    model = meant_language_pretrainer(
        num_encoders=1,
        embedding=EmbeddingConfig(vocab_size=100, hidden_size=768,
                                  max_position_embeddings=40, dropout=0.0),
        text_dim=768, num_heads=8, ff_dropout=0.0)
    loader = ArrayLoader({"input_ids": inputs.astype(np.int32),
                          "attention_mask": mask,
                          "labels": labels.astype(np.int32)}, B)
    tr = mlm_pretrainer({
        "model": model, "model_name": "meant_language_pretrainer",
        "train_data": loader, "epochs": EPOCHS, "lr": lr,
        "lrst": "cosine_warm", "t0": 7, "init_params": params,
        "run_id": "parity"})
    tpu_losses = _drive_tpu(tr, loader, EPOCHS)
    _assert_trajectories_match(torch_losses, tpu_losses)


def test_mim_training_trajectory_matches_torch_reference():
    """Also pins DEFECTS #30 end-to-end: both sides train under the
    L1-on-markers objective and move identically."""
    trp._stub_pretrain_datasets()
    from pretrain_mim import meant_vision_pretrainer as ref_pre
    from transformers import ViTConfig, ViTForMaskedImageModeling

    torch.manual_seed(6)
    vcfg = ViTConfig(hidden_size=768, num_hidden_layers=1,
                     num_attention_heads=8, intermediate_size=64,
                     image_size=32, patch_size=16, encoder_stride=16)
    vit = ViTForMaskedImageModeling(vcfg)
    ref = ref_pre(1, vit.decoder, 768, patch_res=16, channels=4,
                  height=32, width=32)
    ref.train()
    sd = {k: v.clone() for k, v in ref.state_dict().items()}

    from meant_tpu.data.masking import mask_image
    rng = np.random.RandomState(7)
    n = 16
    imgs = rng.rand(n, 4, 32, 32).astype(np.float32)
    inputs, labels = mask_image(imgs, seed=8)

    # ---- torch reference loop (pretrain_mim.py:196-211 minus AMP) ----
    lr = 1e-4
    opt = torch.optim.AdamW(ref.parameters(), lr=lr, weight_decay=0.0,
                            betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=7)
    l1 = nn.L1Loss()   # NO ignore_index — the -100 markers are targets
    torch_losses = []
    for _ in range(EPOCHS):
        for i in range(0, n, B):
            opt.zero_grad()
            out = ref(torch.tensor(inputs[i:i + B]))
            loss = l1(out, torch.tensor(labels[i:i + B, 0:3]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
            opt.step()
            torch_losses.append(float(loss.detach()))
        sched.step()

    # ---- meant_tpu: the production jitted pretrain step ----
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models.pretrainers import meant_vision_pretrainer
    from meant_tpu.train.pretrain import mim_pretrainer
    from meant_tpu.utils import port

    params = port.import_vision_pretrainer(sd, 1)
    model = meant_vision_pretrainer(num_encoders=1, patch_res=16,
                                    channels=4, height=32, width=32,
                                    image_dim=768, num_heads=8)
    loader = ArrayLoader({"input_ids": inputs, "labels": labels}, B)
    tr = mim_pretrainer({
        "model": model, "model_name": "meant_vision_pretrainer",
        "train_data": loader, "epochs": EPOCHS, "lr": lr,
        "lrst": "cosine_warm", "t0": 7, "init_params": params,
        "run_id": "parity"})
    tpu_losses = _drive_tpu(tr, loader, EPOCHS)
    _assert_trajectories_match(torch_losses, tpu_losses)
