"""Production-style end-to-end chip run: the src flagship through the FULL
round-3 pipeline — uint8 charts (normalize-on-device), length-BUCKETED
batches, multi-worker Prefetcher, device-side metrics, async orbax
checkpoint overlapping the test pass — on a planted-signal
TempStockLarge-shaped set. The integration capstone: every data-path and
trainer feature exercised together on hardware, with convergence.

Usage: python scripts/train_src_e2e.py [--epochs 4] [--n 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def planted_tempstock_large(n, lag=5, s=512, seed=0):
    """Synthetic TempStockLarge-shaped set with a planted signal in BOTH
    modalities (first content token + a chart brightness band) and
    REALISTIC dynamic lengths (uniform 64..512 content tokens)."""
    rng = np.random.RandomState(seed)
    ids = rng.randint(2, 64000, size=(n, lag, s)).astype(np.int32)
    y = (ids[:, -1, 0] > 32000).astype(np.int32)
    lengths = rng.randint(64, s + 1, size=n)
    mask = np.zeros((n, lag, s), np.float32)
    for i, ln in enumerate(lengths):
        mask[i, :, :ln] = 1
        ids[i, :, ln:] = 1
    pix = rng.randint(0, 128, size=(n, lag, 3, 224, 224), dtype=np.uint8)
    pix[y == 1, :, :, :32] += 100   # chart-side signal band
    prices = rng.randn(n, lag, 5).astype(np.float32)
    return {"input_ids": ids, "pixels": pix, "prices": prices,
            "attention_masks": mask, "y": y}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--out", default="/tmp/meant_e2e")
    ap.add_argument("--logits_head", action="store_true",
                    help="DEFECTS #23 repair (lifts the safe-lr ceiling)")
    ap.add_argument("--mu_bf16", action="store_true",
                    help="bf16 first Adam moment")
    ap.add_argument("--int8_eval", action="store_true",
                    help="after training, compare int8 vs fp32 serving "
                         "accuracy on the test split (quantized-serving "
                         "quality at TRAINED weights)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from meant_tpu.data import ArrayLoader, split_arrays
    from meant_tpu.data.loader import BucketedLoader
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.meant_src import meant_src
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    data = planted_tempstock_large(args.n)
    train, val, test = split_arrays(data)
    model = meant_src(text_dim=768, image_dim=768, price_dim=5, height=224,
                      width=224, patch_res=16, lag=5, num_classes=2,
                      embedding=EmbeddingConfig(), num_heads=8,
                      num_encoders=12, channels=3, seq_len=512, flash=True,
                      fixed_proj=True,   # repaired head so BOTH branches
                      logits_head=args.logits_head,   # DEFECTS #23 repair
                      dtype=jnp.bfloat16)  # can transmit (DEFECTS #15)

    trainer = meant_trainer({
        "model": model, "model_name": "meant_src",
        "dataset": "TempStockLarge",
        "train_loader": BucketedLoader(
            train, args.batch, buckets=(128, 256, 384, 512), shuffle=True,
            seq_keys=("input_ids", "attention_masks")),
        "val_loader": ArrayLoader(val, args.batch, drop_remainder=False),
        "test_loader": ArrayLoader(test, args.batch, drop_remainder=False),
        "epochs": args.epochs, "num_classes": 2, "lag": 5,
        "file_path": args.out, "run_id": "e2e", "lrst": "constant",
        "lr": args.lr, "test_model": True, "mesh": make_mesh(),
        "mu_dtype": jnp.bfloat16 if args.mu_bf16 else None,
    })
    t0 = time.time()
    results = trainer.train()
    print(f"total wall: {time.time() - t0:.0f}s "
          f"(incl. per-bucket compiles)")
    print("test:", {k: round(v, 4) for k, v in results["test"].items()
                    if isinstance(v, float)})
    ck = os.path.join(args.out, "models", "meant_src")
    print("checkpoint dir contents:", os.listdir(ck))

    if args.int8_eval:
        # quantized-serving quality at TRAINED weights: int8 and fp32
        # predictions / F1 on the held-out test split
        from meant_tpu.serve import Predictor
        tb = {k: v for k, v in test.items() if k != "y"}
        y = test["y"]
        acc = {}
        for quant in (None, "int8"):
            pred = Predictor(model, "meant_src",
                             params=trainer.state.params,
                             batch_size=args.batch, quantize=quant)
            probs = pred(tb)
            pr = np.argmax(probs, -1)
            acc[quant] = float((pr == y).mean())
        print(f"serving accuracy on test: fp32 {acc[None]:.4f} "
              f"vs int8 {acc['int8']:.4f}")


if __name__ == "__main__":
    main()
