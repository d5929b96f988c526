"""Full-convergence cross-framework A/B on a HARD synthetic set (VERDICT r4
next #3).

The 12-step trajectory parity (docs/training_parity.md) proves the per-step
math; its gap is that planted-signal sets saturate at F1 = 1.0, which says
nothing about FINAL-quality parity. This script builds a TempStock-shaped
set with class overlap + label noise + imbalance (converged macro-F1
nontrivially < 1.0), then runs

  * the ACTUAL torch reference loop — `/root/reference/in_loop_train.py:
    202-335` semantics: CE on the model's sigmoid outputs, grad clip 1.0,
    per-epoch scheduler step, val-macro-F1 early stopping with patience 5
    (incl. the prev_f1=inf first-epoch quirk), final test pass — over the
    real reference `meant` imported in place (CUDA deps stubbed exactly
    like tests/test_reference_parity.py), and
  * the meant_tpu production trainer (train/classify.meant_trainer.train(),
    early_stopping=True) from the SAME ported init, the same sklearn-exact
    split membership, and the same batch order,

and compares epochs-to-stop and final test macro-F1. Both sides run fp32
(torch CPU has no autocast; jax pins default_matmul_precision('highest')).
--seeds N re-runs the torch side from N different inits to measure seed
noise — the tolerance band for the cross-framework comparison.

Usage: python scripts/convergence_ab.py [--epochs 40] [--n 600] [--seeds 2]
Results recorded in docs/convergence_ab.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch
from torch import nn

# small-but-real geometry: dim 768 / 8 heads is REQUIRED (the reference
# hardcodes its rotary dim, so head dim must stay 96); depth 1 + tiny
# seq/images keep torch-CPU epochs in seconds while every structural
# element of the flagship (both towers, temporal fusion, lag, rotary/xPos,
# CE-on-sigmoid head) is exercised. lr 2e-5 = the reference default and the
# dim-768 sigmoid-CE stability ceiling (DEFECTS #23).
DIM, NEC, HEADS, S, LAG, IMG, VOCAB = 768, 1, 8, 16, 5, 32, 2000
LR = 2e-5


def build_hard_dataset(n: int, seed: int = 42):
    """TempStock-shaped arrays whose Bayes-optimal macro-F1 is well below
    1.0: 30/70 class imbalance, overlapping class-conditional token and
    chart distributions, 10% label flips."""
    rng = np.random.RandomState(seed)
    y = (rng.rand(n) < 0.3).astype(np.int64)           # ~30% positives
    tweets = rng.randint(2, VOCAB, size=(n, LAG, S)).astype(np.int64)
    # weak text signal: last day's leading tokens shift up for class 1,
    # with heavy overlap
    shift = (y[:, None] * 400 + rng.randint(0, 1200, size=(n, 4)))
    tweets[:, -1, :4] = 2 + (shift % (VOCAB - 2))
    images = (rng.randn(n, LAG, 4, IMG, IMG) * 0.5).astype(np.float32)
    # weak chart signal: mean shift on the last frame
    images[:, -1] += (y * 0.15)[:, None, None, None].astype(np.float32)
    flip = rng.rand(n) < 0.10                           # label noise
    y = np.where(flip, 1 - y, y)
    mask = np.ones((n, LAG, S), np.float32)
    return tweets, images, mask, y


def macro_f1(pred: np.ndarray, true: np.ndarray) -> float:
    """Confusion-matrix macro F1 — same formula as the reference's
    f1_metrics and meant_tpu.utils.metrics.F1Metrics."""
    f1s = []
    for c in (0, 1):
        tp = int(((pred == c) & (true == c)).sum())
        fp = int(((pred == c) & (true != c)).sum())
        fn = int(((pred != c) & (true == c)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * p * r / (p + r) if p + r else 0.0)
    return float(np.mean(f1s))


def build_ref_model(seed: int):
    import test_reference_parity as trp
    trp._install_stubs()
    from meant.meant import meant as ref_meant
    from transformers import RobertaConfig
    from transformers.models.roberta.modeling_roberta import \
        RobertaEmbeddings

    torch.manual_seed(seed)
    cfg = RobertaConfig(vocab_size=VOCAB, hidden_size=DIM,
                        max_position_embeddings=40, type_vocab_size=1,
                        pad_token_id=1, hidden_dropout_prob=0.0,
                        layer_norm_eps=1e-5)
    ref = ref_meant(text_dim=DIM, image_dim=DIM, price_dim=4, height=IMG,
                    width=IMG, patch_res=16, lag=LAG, num_classes=2,
                    embedding=RobertaEmbeddings(cfg), flash=False,
                    num_heads=HEADS, num_encoders=NEC, channels=4)
    for m in ref.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0          # dropout off on BOTH sides: an A/B of the
    return ref                 # optimization path needs matched noise


def run_torch_reference(ref, splits, batch: int, max_epochs: int):
    """The reference training loop (`in_loop_train.py:202-335`) verbatim in
    semantics: CE(sigmoid outputs), clip 1.0, constant-lr scheduler stepped
    per epoch, patience-5 early stop on val macro F1, final test pass."""
    (tr_t, tr_i, tr_m, tr_y), (va_t, va_i, va_m, va_y), \
        (te_t, te_i, te_m, te_y) = splits
    opt = torch.optim.AdamW(ref.parameters(), lr=LR, weight_decay=0.0,
                            betas=(0.9, 0.999))
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda _: 1.0)
    ce = nn.CrossEntropyLoss()

    def predict(t, i, m):
        outs = []
        ref.eval()
        with torch.no_grad():
            for lo in range(0, len(t), batch):
                out = ref(torch.tensor(t[lo:lo + batch]),
                          torch.tensor(i[lo:lo + batch]),
                          attention_mask=torch.tensor(m[lo:lo + batch]))
                outs.append(out.numpy())
        return np.concatenate(outs).argmax(-1)

    prev_f1, patience, stopped_at = float("inf"), 0, max_epochs - 1
    val_curve = []
    t0 = time.time()
    for ep in range(max_epochs):
        ref.train()
        for lo in range(0, len(tr_t) - batch + 1, batch):
            opt.zero_grad()
            out = ref(torch.tensor(tr_t[lo:lo + batch]),
                      torch.tensor(tr_i[lo:lo + batch]),
                      attention_mask=torch.tensor(tr_m[lo:lo + batch]))
            loss = ce(out, torch.tensor(tr_y[lo:lo + batch]))
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), max_norm=1.0)
            opt.step()
        sched.step()
        val_f1 = macro_f1(predict(va_t, va_i, va_m), va_y)
        val_curve.append(round(val_f1, 4))
        print(f"  torch epoch {ep}: val macro-F1 {val_f1:.4f} "
              f"({time.time() - t0:.0f}s)")
        if val_f1 <= prev_f1:          # the reference's quirk: first epoch
            patience += 1              # always pays one patience (prev=inf)
            if patience == 5:
                stopped_at = ep
                print(f"  torch stopped at epoch {ep}")
                break
        else:
            patience = 0
        prev_f1 = val_f1
    test_f1 = macro_f1(predict(te_t, te_i, te_m), te_y)
    return {"stopped_at": stopped_at, "test_f1": round(test_f1, 4),
            "val_curve": val_curve}


def run_meant_tpu(sd, splits, batch: int, max_epochs: int):
    import jax
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # the sandbox pins JAX_PLATFORMS=axon and the plugin overrides the
        # env var — honor an explicit cpu request through jax.config
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant as tpu_meant
    from meant_tpu.train.classify import meant_trainer
    from meant_tpu.utils import port

    (tr_t, tr_i, tr_m, tr_y), (va_t, va_i, va_m, va_y), \
        (te_t, te_i, te_m, te_y) = splits
    params = port.import_meant(sd, num_encoders=NEC)
    model = tpu_meant(
        text_dim=DIM, image_dim=DIM, price_dim=4, height=IMG, width=IMG,
        patch_res=16, lag=LAG, num_classes=2,
        embedding=EmbeddingConfig(vocab_size=VOCAB, hidden_size=DIM,
                                  max_position_embeddings=40, dropout=0.0),
        num_heads=HEADS, num_encoders=NEC, channels=4, ff_dropout=0.0)

    def mk(t, i, m, yy, drop):
        return ArrayLoader({"tweets": t.astype(np.int32), "graphs": i,
                            "attention_masks": m,
                            "y": yy.astype(np.int32)}, batch,
                           shuffle=False, drop_remainder=drop)

    trainer = meant_trainer({
        "model": model, "model_name": "meant", "dataset": "Tempstock",
        "train_loader": mk(tr_t, tr_i, tr_m, tr_y, True),
        "val_loader": mk(va_t, va_i, va_m, va_y, False),
        "test_loader": mk(te_t, te_i, te_m, te_y, False),
        "epochs": max_epochs, "num_classes": 2, "lag": LAG,
        "run_id": "convergence_ab", "lrst": "constant", "lr": LR,
        "decay": 0.0, "early_stopping": True, "test_model": True,
        "init_params": params, "file_path": "/tmp/convergence_ab",
    })
    with jax.default_matmul_precision("highest"):
        results = trainer.train()
    hist = results["history"]
    return {"stopped_at": hist[-1]["epoch"],
            "test_f1": round(results["test"]["f1_macro"], 4),
            "val_curve": [round(h["val_f1_macro"], 4) for h in hist]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=2,
                    help="torch inits to run (>=2 measures seed noise)")
    args = ap.parse_args()

    from meant_tpu.data import train_val_test_split
    tweets, images, mask, y = build_hard_dataset(args.n)
    tr, va, te = train_val_test_split(args.n)   # sklearn-exact membership
    pick = lambda ix: (tweets[ix], images[ix], mask[ix], y[ix])
    splits = (pick(tr), pick(va), pick(te))
    rates = [float(y[ix].mean()) for ix in (tr, va, te)]
    print(f"hard set: n={args.n}, positive rates train/val/test = "
          f"{[round(r, 3) for r in rates]}")

    torch_runs = []
    sd0 = None
    for seed in range(args.seeds):
        print(f"torch reference run, init seed {seed}:")
        ref = build_ref_model(seed)
        if seed == 0:
            sd0 = {k: v.clone() for k, v in ref.state_dict().items()}
        torch_runs.append(run_torch_reference(ref, splits, args.batch,
                                              args.epochs))
        del ref

    print("meant_tpu run (ported seed-0 init, same split + batch order):")
    tpu_run = run_meant_tpu(sd0, splits, args.batch, args.epochs)

    out = {"torch": torch_runs, "meant_tpu": tpu_run,
           "config": {"n": args.n, "batch": args.batch, "lr": LR,
                      "dim": DIM, "nec": NEC, "seq": S, "epochs": args.epochs}}
    print(json.dumps(out, indent=2))
    seed_spread = (max(r["test_f1"] for r in torch_runs)
                   - min(r["test_f1"] for r in torch_runs)
                   if len(torch_runs) > 1 else None)
    diff = abs(tpu_run["test_f1"] - torch_runs[0]["test_f1"])
    print(f"\ntest macro-F1: torch(seed0) {torch_runs[0]['test_f1']} vs "
          f"meant_tpu {tpu_run['test_f1']} (|diff| {diff:.4f}; torch "
          f"seed spread {seed_spread})")
    print(f"epochs-to-stop: torch(seed0) {torch_runs[0]['stopped_at']} vs "
          f"meant_tpu {tpu_run['stopped_at']}")


if __name__ == "__main__":
    main()
