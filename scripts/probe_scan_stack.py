"""Probe: scanned encoder stacks + remat policies on the real chip.

Measures, for one configuration of the src-era model (bench.py geometry):
  - trace+lower time and backend compile time of the jitted train step
    (cold — the persistent compile cache is disabled before import)
  - the compiler's HBM accounting (memory_analysis: temp/argument bytes)
  - steady-state step time (value-fetch barrier per CLAUDE.md)

Run serially per chip job, e.g.:
    python scripts/probe_scan_stack.py --num_encoders 30 --batch 8
    python scripts/probe_scan_stack.py --num_encoders 30 --batch 8 --scan_layers
    python scripts/probe_scan_stack.py --num_encoders 30 --batch 16 --remat dots

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
    ap.add_argument("--num_encoders", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--scan_layers", action="store_true")
    ap.add_argument("--remat", nargs="?", const="full", default=False,
                    choices=["full", "dots"])
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (smoke runs; the sandbox "
                         "env pins JAX_PLATFORMS=axon and the plugin "
                         "overrides the env var, so set it via jax.config)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bench import build_src
    from meant_tpu.data import ArrayLoader
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    model, name, data, b, metric = build_src(
        args.seq, batch=args.batch, num_encoders=args.num_encoders,
        remat=args.remat, scan_layers=args.scan_layers)

    trainer = meant_trainer({
        "model": model, "model_name": name, "dataset": "TempStockLarge",
        "train_loader": ArrayLoader(data, b), "epochs": 1,
        "num_classes": 2, "lag": 5,
        "mesh": make_mesh(), "test_model": False, "run_id": "probe",
        "lrst": "constant", "lr": 1e-5,
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
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                mem[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
    except Exception as e:   # remote-compile services may not expose it
        mem["error"] = str(e)[:120]

    t0 = time.perf_counter()
    state, loss, cm = compiled(trainer.state, db)
    loss0 = float(loss)
    t_first = time.perf_counter() - t0

    for _ in range(2):
        state, loss, cm = compiled(state, db)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss, cm = compiled(state, db)
    lossN = float(loss)
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "config": {"num_encoders": args.num_encoders, "batch": args.batch,
                   "seq": args.seq, "scan_layers": args.scan_layers,
                   "remat": args.remat},
        "t_init_s": round(t_init, 1),
        "t_trace_lower_s": round(t_trace, 1),
        "t_compile_s": round(t_compile, 1),
        "t_first_step_s": round(t_first, 1),
        "step_ms": round(dt * 1e3, 1),
        "samples_per_s": round(args.batch / dt, 2),
        "loss_first": round(loss0, 4), "loss_last": round(lossN, 4),
        "memory": mem,
    }))


if __name__ == "__main__":
    main()
