"""Full-geometry cross-framework training-trajectory run (VERDICT r2 #1).

Same protocol as tests/test_training_parity.py, at FULL MEANT-12 geometry:
text/image dim 768, 12+12 encoders, bertweet vocab 64001, 224x224 4-channel
charts (196 patches), s=128 tweets, lag 5 — the paper-generation flagship.
The torch reference trains on CPU (fp32, no AMP); meant_tpu runs the
production jitted train step on whatever backend is active (the real chip
under the default env; pass JAX_PLATFORMS=cpu to pin CPU). fp32 matmuls on
TPU default to bf16-decomposed passes, so the run pins
jax.default_matmul_precision('highest') — trajectory comparison needs
like-for-like arithmetic, and throughput is not the point here.

Usage: python scripts/training_parity_full.py [--steps 12] [--batch 8]
Writes the loss table to stdout; results recorded in
docs/training_parity.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch
from torch import nn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num_encoders", type=int, default=12)
    ap.add_argument("--seq_len", type=int, default=128)
    args = ap.parse_args()

    import test_reference_parity as trp
    trp._install_stubs()
    from meant.meant import meant as ref_meant
    from transformers import RobertaConfig
    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings

    LR = 2e-5
    B, S, NEC = args.batch, args.seq_len, args.num_encoders
    n = 2 * B   # two batches per epoch, fixed order
    epochs = max(args.steps // 2, 1)

    torch.manual_seed(0)
    cfg = RobertaConfig(vocab_size=64001, hidden_size=768,
                        max_position_embeddings=130, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    print(f"building torch reference meant-{NEC} (full geometry) ...")
    ref = ref_meant(text_dim=768, image_dim=768, price_dim=4, height=224,
                    width=224, patch_res=16, lag=5, num_classes=2,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=8, num_encoders=NEC, channels=4)
    for m in ref.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
    ref.train()

    rng = np.random.RandomState(42)
    tweets = rng.randint(2, 64000, size=(n, 5, S)).astype(np.int64)
    y = (tweets[:, -1, 0] > 32000).astype(np.int64)
    mask = np.ones((n, 5, S), np.float32)
    mask[:, :, S - S // 4:] = 0
    tweets[:, :, S - S // 4:] = 1
    images = (rng.randn(n, 5, 4, 224, 224) * 0.5).astype(np.float32)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}

    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.0,
                            betas=(0.9, 0.999))
    ce = nn.CrossEntropyLoss()
    torch_losses = []
    t0 = time.time()
    for _ in range(epochs):
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
            print(f"  torch step {len(torch_losses) - 1}: "
                  f"{torch_losses[-1]:.6f} ({time.time() - t0:.0f}s)")

    import jax
    import jax.numpy as jnp

    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant as tpu_meant
    from meant_tpu.train.classify import meant_trainer
    from meant_tpu.utils import port

    print("porting weights + building meant_tpu ...")
    params = port.import_meant(sd, num_encoders=NEC)
    del ref, sd, opt
    model = tpu_meant(
        text_dim=768, image_dim=768, price_dim=4, height=224, width=224,
        patch_res=16, lag=5, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=64001, hidden_size=768,
                                  max_position_embeddings=130, dropout=0.0),
        num_heads=8, num_encoders=NEC, channels=4, ff_dropout=0.0)
    loader = ArrayLoader(
        {"tweets": tweets.astype(np.int32), "graphs": images,
         "attention_masks": mask, "y": y.astype(np.int32)},
        B, shuffle=False)
    trainer = meant_trainer({
        "model": model, "model_name": "meant", "dataset": "Tempstock",
        "train_loader": loader, "epochs": epochs, "num_classes": 2,
        "lag": 5, "run_id": "parity_full", "lrst": "constant", "lr": LR,
        "decay": 0.0, "test_model": False, "init_params": params,
    })
    with jax.default_matmul_precision("highest"):
        trainer._init_state(next(iter(loader)))
        trainer._build_steps()
        tpu_losses = []
        t0 = time.time()
        for _ in range(epochs):
            for batch in loader:
                db = trainer._device_batch(batch)
                trainer.state, loss, _ = trainer._jit_train(
                    trainer.state, db)
                tpu_losses.append(float(loss))
                print(f"  tpu step {len(tpu_losses) - 1}: "
                      f"{tpu_losses[-1]:.6f} ({time.time() - t0:.0f}s)")

    print("\nstep |  torch    |  tpu      | diff")
    for i, (a, b) in enumerate(zip(torch_losses, tpu_losses)):
        print(f"{i:4d} | {a:.6f} | {b:.6f} | {abs(a - b):.2e}")
    diffs = [abs(a - b) for a, b in zip(torch_losses, tpu_losses)]
    print(f"max per-step loss diff: {max(diffs):.3e}")
    print(f"torch {torch_losses[0]:.4f} -> {torch_losses[-1]:.4f}; "
          f"tpu {tpu_losses[0]:.4f} -> {tpu_losses[-1]:.4f}")


if __name__ == "__main__":
    main()
