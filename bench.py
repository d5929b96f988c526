"""Benchmark: MEANT-12 training throughput (samples/sec/chip) on
TempStockLarge-shaped data.

Baseline (BASELINE.md): the reference trains src-era meant at ~1.42-1.44 it/s
@ batch 16 on an A100-SXM4-80GB => ~23 samples/s/GPU (`src/slurm-42756024.out`).
Shapes here mirror that workload: batch 16, lag 5, 128-token tweets
(`dataprep.py` pads TempStock tweets to 128), 224x224 chart images, patch 16
(196 tokens), 12+12 encoders, bf16 activations / fp32 params.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 23.0


def main():
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    b, lag, s = 16, 5, 128
    model = meant(text_dim=768, image_dim=768, price_dim=4, height=224,
                  width=224, patch_res=16, lag=lag, num_classes=2,
                  embedding=EmbeddingConfig(), num_heads=8, num_encoders=12,
                  dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    data = {
        "tweets": rng.randint(2, 64000, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 224, 224).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }
    mesh = make_mesh()
    n_chips = len(jax.devices())
    trainer = meant_trainer({
        "model": model, "model_name": "meant", "dataset": "Tempstock",
        "train_loader": ArrayLoader(data, b), "epochs": 1,
        "num_classes": 2, "lag": lag, "mesh": mesh, "test_model": False,
        "run_id": "bench", "lrst": "constant", "lr": 1e-5,
    })
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    trainer._build_steps()
    db = trainer._device_batch(batch)

    # compile + warmup. NOTE: on the tunneled TPU platform
    # jax.block_until_ready can return before execution completes — fetching
    # the scalar value is the only reliable completion barrier, so timings
    # below close with float(loss).
    state, loss, cm = trainer._jit_train(trainer.state, db)
    trainer.state = state
    for _ in range(2):
        trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
    float(loss)

    steps = 20
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
    float(loss)  # true barrier: value can't arrive before the chain finishes
    dt = time.perf_counter() - t0

    samples_per_sec = steps * b / dt
    per_chip = samples_per_sec / max(n_chips, 1)
    print(json.dumps({
        "metric": "TempStockLarge train samples/sec/chip (MEANT-12, bf16)",
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
