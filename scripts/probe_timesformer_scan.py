"""Probe: meant_timesformer on the real chip — throughput + cold compile,
unrolled vs --scan_layers (VERDICT r3 #3: the timesformer family had no
on-chip datapoint and lacked the scan/remat lever until round 4).

Geometry: TempStockLarge shapes (s=512 full-padded text, 3-channel 224²
charts, lag 5) at the reference CLI defaults (12 languageEncoders; the
TimeSformer branch is depth-1 BY REFERENCE DESIGN —
`src/meant/meant_timesformer.py:259`).

Run serially per chip job:
    python scripts/probe_timesformer_scan.py --batch 16
    python scripts/probe_timesformer_scan.py --batch 16 --scan_layers
Prints one JSON line with every phase timing.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("MEANT_TPU_NO_COMPILE_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_encoders", type=int, default=12)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--scan_layers", action="store_true")
    ap.add_argument("--remat", nargs="?", const="full", default=False,
                    choices=["full", "dots"])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant_timesformer
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    b, lag, s = args.batch, 5, args.seq
    model = meant_timesformer(
        text_dim=768, image_dim=768, price_dim=5, height=224, width=224,
        patch_res=16, lag=lag, num_classes=2, embedding=EmbeddingConfig(),
        num_heads=8, num_encoders=args.num_encoders, channels=3, seq_len=512,
        scan_layers=args.scan_layers, remat=args.remat, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    data = {
        "input_ids": rng.randint(2, 64000, size=(b, lag, s)).astype(np.int32),
        "pixels": rng.randn(b, lag, 3, 224, 224).astype(np.float32),
        "prices": rng.randn(b, lag, 5).astype(np.float32),
        "attention_mask": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }
    trainer = meant_trainer({
        "model": model, "model_name": "meant_timesformer",
        "dataset": "TempStockLarge", "train_loader": ArrayLoader(data, b),
        "epochs": 1, "num_classes": 2, "lag": lag, "mesh": make_mesh(),
        "test_model": False, "run_id": "probe", "lrst": "constant",
        "lr": 1e-5,
    })

    t0 = time.perf_counter()
    trainer._init_state(data)
    jax.block_until_ready(trainer.state.params)
    t_init = time.perf_counter() - t0
    trainer._build_steps()
    db = trainer._device_batch(data)
    jax.block_until_ready(db)

    t0 = time.perf_counter()
    lowered = trainer._jit_train.lower(trainer.state, db)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0

    mem = {}
    try:
        ma = compiled.memory_analysis()
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
    except Exception as e:
        mem["error"] = str(e)[:120]

    state, loss, cm = compiled(trainer.state, db)
    loss0 = float(loss)
    for _ in range(2):
        state, loss, cm = compiled(state, db)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss, cm = compiled(state, db)
    lossN = float(loss)
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "config": {"model": "meant_timesformer",
                   "num_encoders": args.num_encoders, "batch": args.batch,
                   "seq": args.seq, "scan_layers": args.scan_layers,
                   "remat": args.remat},
        "t_init_s": round(t_init, 1),
        "t_trace_lower_s": round(t_trace, 1),
        "t_compile_s": round(t_compile, 1),
        "step_ms": round(dt * 1e3, 1),
        "samples_per_s": round(args.batch / dt, 2),
        "loss_first": round(loss0, 4), "loss_last": round(lossN, 4),
        "memory": mem,
    }))


if __name__ == "__main__":
    main()
