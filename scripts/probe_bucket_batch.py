"""Probe: per-bucket batch scaling for the length-bucketed workload.

The BucketedLoader batches each length bucket at the SAME batch size (16 —
the measured s=512 optimum). Shorter buckets run fewer tokens per step, so
the chip may be underutilized there; the classic TPU fix is a constant
TOKEN budget (batch inversely proportional to bucket length). This probe
measures the src flagship train step at each bucket length x batch size on
the real chip so the bucketed bench can pick per-bucket batches from data,
not assumption. (The s=512 sweep already exists: b16 54.1 > b24 51.2 >
b32 45.0 — HBM pressure; see CLAUDE.md perf ledger.)

Run serially on the chip:  python scripts/probe_bucket_batch.py
"""

import sys
import time

sys.path.insert(0, ".")


def measure(seq_len: int, batch: int, steps: int = 12) -> float:
    import jax.numpy as jnp

    from bench import build_src
    from meant_tpu.data import ArrayLoader
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    model, name, data, b, _ = build_src(seq_len, batch=batch)
    trainer = meant_trainer({
        "model": model, "model_name": name, "dataset": "TempStockLarge",
        "train_loader": ArrayLoader(data, b), "epochs": 1,
        "num_classes": 2, "lag": 5, "mesh": make_mesh(),
        "test_model": False, "run_id": "probe", "lrst": "constant",
        "lr": 1e-5,
    })
    batch0 = next(iter(trainer.train_loader))
    trainer._init_state(batch0)
    trainer._build_steps()
    db = trainer._device_batch(batch0)
    for _ in range(3):  # compile + warm
        trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
    float(loss)  # tunnel-safe barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
    float(loss)
    dt = time.perf_counter() - t0
    rate = steps * b / dt
    print(f"s={seq_len:4d} b={b:3d}: {rate:7.1f} samples/s "
          f"({dt / steps * 1e3:6.1f} ms/step)", flush=True)
    return rate


def main():
    configs = [(128, 16), (128, 32), (128, 64),
               (256, 16), (256, 32),
               (384, 16), (384, 24)]
    results = {}
    for s, b in configs:
        try:
            results[(s, b)] = measure(s, b)
        except Exception as e:  # OOM etc — record and continue
            print(f"s={s} b={b}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    print(results)


if __name__ == "__main__":
    main()
