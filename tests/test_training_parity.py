"""Cross-framework TRAINING-TRAJECTORY equivalence (the achievable proxy for
the blocked real-data F1-parity clause of BASELINE.json).

Protocol (VERDICT r2 #1): build the ACTUAL torch reference `meant`
(/root/reference/meant/meant.py, stubs from test_reference_parity), port its
init into meant_tpu (`utils/port.import_meant` — same weights at t=0), train
BOTH on the identical synthetic planted-signal TempStock-shaped set — same
batch order (no shuffle), AdamW lr 2e-5 / betas (0.9, 0.999) / wd 0,
grad-clip 1.0, dropout zeroed on both sides, fp32 CPU — and assert the
per-step loss curves and the final logits track.

The torch side replicates the reference train loop minus AMP
(`in_loop_train.py:202-239`: zero_grad -> forward -> CrossEntropyLoss on the
sigmoid outputs -> backward -> clip_grad_norm_(1.0) -> step; the per-epoch
lr_scheduler.step at :280 is a no-op under the constant schedule used here).
The meant_tpu side runs the REAL jitted production train step
(`train/classify.py meant_trainer._jit_train` — the same step bench.py
times), not a test-only reimplementation.

Measured drift (fp32 CPU, 12 steps): per-step loss diff <= 6e-5, final
logits <= 3e-4 — asserted with ~8x margin below. This converts "logits match
at t=0" into "the training dynamics (loss, gradients, clipping, AdamW,
schedule) match end-to-end", which is everything the missing real
TempStock/Stocknet data would have shown except the dataset itself.

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

# B=8 shards cleanly over the conftest's 8-device CPU mesh (the tpu side
# runs the production DP train step); 6 epochs x 2 batches = 12 steps.
LR, B, EPOCHS = 2e-5, 8, 6


def _planted_signal_set(n=16, lag=5, s=16):
    """TempStock-shaped synthetic set with a learnable signal: the label is
    a function of the target day's first token."""
    rng = np.random.RandomState(42)
    tweets = rng.randint(2, 100, size=(n, lag, s)).astype(np.int64)
    y = (tweets[:, -1, 0] > 50).astype(np.int64)
    mask = np.ones((n, lag, s), np.float32)
    mask[:, :, 12:] = 0
    tweets[:, :, 12:] = 1
    images = (rng.randn(n, lag, 4, 32, 32) * 0.5).astype(np.float32)
    return tweets, images, mask, y


def test_training_trajectory_matches_torch_reference():
    trp._install_stubs()
    from meant.meant import meant as ref_meant
    from transformers import RobertaConfig
    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings

    torch.manual_seed(0)
    cfg = RobertaConfig(vocab_size=100, hidden_size=768,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    ref = ref_meant(text_dim=768, image_dim=768, price_dim=4, height=32,
                    width=32, patch_res=16, lag=5, num_classes=2,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=8, num_encoders=1, channels=4)
    for m in ref.modules():        # protocol: dropout off on both sides
        if isinstance(m, nn.Dropout):
            m.p = 0.0
    ref.train()

    tweets, images, mask, y = _planted_signal_set()
    n = len(y)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}

    # ---- torch reference loop (in_loop_train.py:202-239 minus AMP) ----
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.0,
                            betas=(0.9, 0.999))
    ce = nn.CrossEntropyLoss()
    torch_losses = []
    for _ in range(EPOCHS):
        for i in range(0, n, B):
            opt.zero_grad()
            out = ref(torch.tensor(tweets[i:i + B]),
                      torch.tensor(images[i:i + B]),
                      torch.tensor(mask[i:i + B]))
            loss = ce(out, torch.tensor(y[i:i + B]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
            opt.step()
            torch_losses.append(float(loss.detach()))
    ref.eval()
    with torch.no_grad():
        final_ref = ref(torch.tensor(tweets), torch.tensor(images),
                        torch.tensor(mask)).numpy()

    # ---- meant_tpu: the production jitted train step ----
    import jax.numpy as jnp

    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant as tpu_meant
    from meant_tpu.train.classify import meant_trainer
    from meant_tpu.utils import port

    params = port.import_meant(sd, num_encoders=1)
    model = tpu_meant(
        text_dim=768, image_dim=768, price_dim=4, height=32, width=32,
        patch_res=16, lag=5, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=100, hidden_size=768,
                                  max_position_embeddings=40, dropout=0.0),
        num_heads=8, num_encoders=1, channels=4, ff_dropout=0.0)
    loader = ArrayLoader(
        {"tweets": tweets.astype(np.int32), "graphs": images,
         "attention_masks": mask, "y": y.astype(np.int32)},
        B, shuffle=False)
    trainer = meant_trainer({
        "model": model, "model_name": "meant", "dataset": "Tempstock",
        "train_loader": loader, "epochs": EPOCHS, "num_classes": 2,
        "lag": 5, "run_id": "parity", "lrst": "constant", "lr": LR,
        "decay": 0.0, "test_model": False, "init_params": params,
    })
    trainer._init_state(next(iter(loader)))
    trainer._build_steps()
    tpu_losses = []
    for _ in range(EPOCHS):
        for batch in loader:
            db = trainer._device_batch(batch)
            trainer.state, loss, _ = trainer._jit_train(trainer.state, db)
            tpu_losses.append(float(loss))

    final_tpu = np.asarray(model.apply(
        {"params": trainer.state.params},
        jnp.asarray(tweets.astype(np.int32)), jnp.asarray(images),
        jnp.asarray(mask)))

    # per-step trajectory equivalence
    assert len(torch_losses) == len(tpu_losses) == EPOCHS * (n // B)
    step_diffs = [abs(a - b) for a, b in zip(torch_losses, tpu_losses)]
    assert max(step_diffs) <= 5e-4, (
        f"training trajectories diverged: per-step loss diffs {step_diffs}")
    # post-training logits equivalence (both models moved the same way)
    logit_diff = np.abs(final_tpu - final_ref).max()
    assert logit_diff <= 2e-3, f"post-training logit diff {logit_diff}"
    # identical post-training predictions => identical F1 on this set
    assert (final_tpu.argmax(-1) == final_ref.argmax(-1)).all()
    # and both actually learned (loss moved down on the planted signal)
    assert torch_losses[-1] < torch_losses[0]
    assert tpu_losses[-1] < tpu_losses[0]
