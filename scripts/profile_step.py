"""Capture a jax.profiler trace of the DEFAULT bench train step (src512,
flash both branches) on the real chip, then print a per-category device-op
summary. Round-3 step-time attack workflow (VERDICT r2 #2).

Usage: python scripts/profile_step.py [--workload src512] [--out DIR]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize(trace_path, n_steps):
    with gzip.open(trace_path) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pidname = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    cats = collections.defaultdict(float)
    srcs = collections.defaultdict(float)
    tot = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and \
                "TPU" in pidname.get(e["pid"], ""):
            n = e["name"]
            if re.fullmatch(r"\d+", n) or "jit_train" in n:
                continue
            base = re.sub(r"[.\d]+$", "", n)
            cats[base] += e["dur"]
            a = e.get("args", {})
            src = a.get("source", "?").replace(
                "/opt/venv/lib/python3.12/site-packages/", "")
            srcs[(base, src)] += e["dur"]
            tot += e["dur"]
    print(f"total device time: {tot / n_steps / 1e3:.2f} ms/step")
    for n, d in sorted(cats.items(), key=lambda kv: -kv[1])[:16]:
        print(f"  {d / n_steps / 1e3:8.2f} ms/step  {n}")
    print("top sources:")
    for (b, s), d in sorted(srcs.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {d / n_steps / 1e3:8.2f} ms/step  {b:28s} {s}")


def profile_pretrain(args):
    """mlm/mim: profile the production jitted pretrain step."""
    import jax
    import bench
    from meant_tpu.data import ArrayLoader
    from meant_tpu.parallel import make_mesh, shard_batch
    from meant_tpu.train.pretrain import mim_pretrainer, mlm_pretrainer

    build = bench.build_mlm if args.workload == "mlm" else bench.build_mim
    kind, model, data, b, _ = build(batch=args.batch or 16)
    cls = mlm_pretrainer if kind == "mlm" else mim_pretrainer
    tr = cls({
        "model": model, "model_name": f"meant_{kind}_prof",
        "train_data": ArrayLoader(data, b), "epochs": 1,
        "lr": 5e-5, "lrst": "cosine_warm", "run_id": "prof",
        "mesh": make_mesh(),
    })
    batch = next(iter(tr.train_data))
    tr._init_state(batch)
    tr._build_steps()
    db = shard_batch(jax.tree.map(jax.numpy.asarray, dict(batch)), tr.mesh)
    for _ in range(3):
        tr.state, loss = tr._jit_train(tr.state, db)
    print(f"warm loss {float(loss):.4f}")

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        tr.state, loss = tr._jit_train(tr.state, db)
    float(loss)
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {dt * 1e3:.1f} ms "
          f"({args.steps * b / dt:.1f} samples/s)")
    traces = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    print("trace:", traces[-1])
    summarize(traces[-1], args.steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="src512")
    ap.add_argument("--out", default="/tmp/meant_step_trace")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=None,
                    help="batch override (mlm/mim workloads)")
    args = ap.parse_args()

    import jax
    import bench

    if args.workload in ("mlm", "mim"):
        return profile_pretrain(args)
    if args.workload == "paper128":
        model, name, data, b, _ = bench.build_paper128()
    elif args.workload == "src256":
        model, name, data, b, _ = bench.build_src(256)
    elif args.workload == "tweet":
        model, name, data, b, _ = bench.build_tweet(batch=args.batch or 32)
    else:
        model, name, data, b, _ = bench.build_src(512)

    from meant_tpu.data import ArrayLoader
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    trainer = meant_trainer({
        "model": model, "model_name": name, "dataset": "TempStockLarge",
        "train_loader": ArrayLoader(data, b), "epochs": 1, "num_classes": 2,
        "lag": 5, "mesh": make_mesh(), "test_model": False,
        "run_id": "prof", "lrst": "constant", "lr": 1e-5,
    })
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    trainer._build_steps()
    db = trainer._device_batch(batch)
    for _ in range(3):   # compile + warm
        trainer.state, loss, _ = trainer._jit_train(trainer.state, db)
    print(f"warm loss {float(loss):.4f}")

    t0 = time.perf_counter()
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        trainer.state, loss, _ = trainer._jit_train(trainer.state, db)
    float(loss)
    jax.profiler.stop_trace()
    dt = time.perf_counter() - t0
    print(f"traced {args.steps} steps in {dt * 1e3:.1f} ms "
          f"({args.steps * b / dt:.1f} samples/s)")

    traces = sorted(glob.glob(os.path.join(
        args.out, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    print("trace:", traces[-1])
    summarize(traces[-1], args.steps)


if __name__ == "__main__":
    main()
