"""Production soak run (VERDICT r4 next #4): N epochs of the flagship
through the REAL input pipeline, with per-epoch eval + orbax checkpoints, a
mid-run KILL + `--epoch` resume, and steady-state assertions.

What it proves (the reference's multi-epoch `length:` logs,
`src/slurm-*.out`, as the anchor): the *system* — host collate + uint8
charts + Prefetcher H2D overlap + jitted train step + device-side metrics +
checkpoint each epoch — holds for hours-shaped runs, not just one timed
step:

  * no recompiles after each process's first epoch (jit cache size flat)
  * step-time p50 flat across epochs (no drift/leak in the dispatch path)
  * host RSS stable (no loader/prefetcher leak)
  * a SIGKILL-style death mid-epoch resumes from the last completed orbax
    checkpoint (params + optimizer state) and finishes the run

Driver mode (default) spawns the worker, expects the planted kill, then
respawns with --epoch to resume, and checks the combined log. The sustained
samples/s is published with vs_baseline null — on this sandbox the tunneled
TPU moves H2D at ~25 MB/s (README 'input pipeline' honesty note), so the
absolute rate is a tunnel artifact; the steady-state properties are the
result.

Usage:
  python scripts/soak.py [--epochs 5] [--n 640] [--out /tmp/meant_soak]
  python scripts/soak.py --worker ...   (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def build_trainer(args):
    import jax
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # the sandbox pins JAX_PLATFORMS=axon and the plugin overrides the
        # env var — honor an explicit cpu request (smoke mode) via config
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from train_src_e2e import planted_tempstock_large
    from meant_tpu.data import ArrayLoader, split_arrays
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.meant_src import meant_src
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    data = planted_tempstock_large(args.n, s=args.seq)  # uint8 charts,
    train, val, test = split_arrays(data)               # dynamic masks
    model = meant_src(text_dim=768, image_dim=768, price_dim=5, height=224,
                      width=224, patch_res=16, lag=5, num_classes=2,
                      embedding=EmbeddingConfig(), num_heads=8,
                      num_encoders=args.nec, channels=3,
                      seq_len=max(512, args.seq), flash=args.seq >= 256,
                      fixed_proj=True, dtype=jnp.bfloat16)
    return meant_trainer({
        "model": model, "model_name": "meant_src",
        "dataset": "TempStockLarge",
        "train_loader": ArrayLoader(train, args.batch, shuffle=True,
                                    seed=7),
        "val_loader": ArrayLoader(val, args.batch, drop_remainder=False),
        "test_loader": ArrayLoader(test, args.batch, drop_remainder=False),
        "epochs": args.epochs, "num_classes": 2, "lag": 5,
        "file_path": args.out, "run_id": "soak", "lrst": "constant",
        "lr": 2e-5, "test_model": True, "mesh": make_mesh(),
    })


def worker(args):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from meant_tpu.data.loader import Prefetcher

    trainer = build_trainer(args)
    sample = next(iter(trainer.train_loader))
    if args.epoch > 0:
        trainer.resume(args.epoch, sample)   # params + optimizer state
    else:
        trainer._init_state(sample)
    trainer._build_steps()
    cache_size = getattr(trainer._jit_train, "_cache_size", lambda: -1)

    logf = open(os.path.join(args.out, "soak_log.jsonl"), "a")

    def log(rec):
        logf.write(json.dumps(rec) + "\n")
        logf.flush()

    log({"event": "start", "pid": os.getpid(), "from_epoch": args.epoch,
         "rss_mb": round(rss_mb(), 1)})
    for ep in range(args.epoch, args.epochs):
        t_ep = time.time()
        step_ms, losses = [], []
        for i, db in enumerate(Prefetcher(trainer.train_loader,
                                          trainer._device_batch)):
            t0 = time.perf_counter()
            trainer.state, loss, _cm = trainer._jit_train(trainer.state, db)
            losses.append(float(loss))   # per-step value fetch: the soak
            # measures the sustained pipeline WITH its sync cost — and on
            # the tunneled TPU a value fetch is the only true barrier
            step_ms.append((time.perf_counter() - t0) * 1e3)
            if ep == args.kill_at_epoch and i == args.kill_at_step:
                log({"event": "kill", "epoch": ep, "step": i})
                os._exit(137)   # simulated node death: no cleanup, no save
        val_f1, _, _ = trainer.evaluate(trainer.val_loader, "validation")
        trainer.save(ep + 1, block=True)   # epoch checkpoint, then barrier
        ms = np.asarray(step_ms)
        log({"event": "epoch", "epoch": ep, "steps": len(ms),
             "samples": len(ms) * args.batch,
             "p50_ms": round(float(np.percentile(ms, 50)), 1),
             "p90_ms": round(float(np.percentile(ms, 90)), 1),
             "mean_loss": round(float(np.mean(losses)), 4),
             "val_f1": round(val_f1, 4),
             "rss_mb": round(rss_mb(), 1),
             "jit_cache": int(cache_size()),
             "wall_s": round(time.time() - t_ep, 1)})
    test_f1, _, tm = trainer.evaluate(trainer.test_loader, "test")
    log({"event": "done", "test_f1": round(test_f1, 4)})


def driver(args):
    os.makedirs(args.out, exist_ok=True)
    logpath = os.path.join(args.out, "soak_log.jsonl")
    if os.path.exists(logpath):
        os.unlink(logpath)
    base = [sys.executable, os.path.abspath(__file__), "--worker",
            "--epochs", str(args.epochs), "--n", str(args.n),
            "--batch", str(args.batch), "--nec", str(args.nec),
            "--seq", str(args.seq), "--out", args.out]
    kill_epoch = args.epochs // 2
    kill_step = args.kill_at_step if args.kill_at_step >= 0 else 5
    # the planted kill must land on a step that exists: the 60% train
    # split at this batch size gives (0.6*n)//batch steps per epoch
    steps_per_epoch = int(args.n * 0.6) // args.batch
    assert kill_step < steps_per_epoch, (
        f"kill_at_step {kill_step} never fires: only {steps_per_epoch} "
        f"steps/epoch at n={args.n} b={args.batch} — pass --kill_at_step")
    print(f"soak: phase 1 (will be KILLED mid-epoch {kill_epoch}) ...")
    rc = subprocess.call(base + ["--kill_at_epoch", str(kill_epoch),
                                 "--kill_at_step", str(kill_step)])
    assert rc == 137, f"phase 1 should die with the planted kill, got {rc}"

    recs = [json.loads(l) for l in open(logpath)]
    done_epochs = [r["epoch"] for r in recs if r["event"] == "epoch"]
    assert done_epochs, "no epoch completed before the kill"
    resume_from = max(done_epochs) + 1   # checkpoints are named epoch+1
    print(f"soak: killed as planned; resuming from --epoch {resume_from}")
    rc = subprocess.call(base + ["--epoch", str(resume_from)])
    assert rc == 0, f"resume phase failed with {rc}"

    recs = [json.loads(l) for l in open(logpath)]
    epochs = [r for r in recs if r["event"] == "epoch"]
    starts = [r for r in recs if r["event"] == "start"]
    done = [r for r in recs if r["event"] == "done"]
    assert len(starts) == 2 and len(done) == 1
    assert sorted(r["epoch"] for r in epochs) == list(range(args.epochs)), \
        f"epoch coverage hole: {[r['epoch'] for r in epochs]}"

    # ---- steady-state assertions ----
    by_pid = {}
    pid = None
    for r in recs:
        if r["event"] == "start":
            pid = r["pid"]
        elif r["event"] == "epoch":
            by_pid.setdefault(pid, []).append(r)
    for p, es in by_pid.items():
        sizes = [e["jit_cache"] for e in es]
        if sizes[0] >= 0:   # -1 = introspection unavailable on this jax
            assert max(sizes) == sizes[0], \
                f"jit cache GREW after first epoch in pid {p}: {sizes}"
        rss = [e["rss_mb"] for e in es]
        assert rss[-1] <= rss[0] * 1.15 + 256, \
            f"RSS drift in pid {p}: {rss}"
    # each process's FIRST epoch pays compiles (epoch 0 in phase 1, the
    # resume epoch in phase 2 — absorbed by the persistent compile cache
    # on chip, but not guaranteed), so the steady-state drift window is
    # every epoch AFTER its process's first
    p50s = [e["p50_ms"] for es in by_pid.values() for e in es[1:]]
    if len(p50s) >= 2:
        assert max(p50s) <= 1.3 * min(p50s), f"step-time drift: {p50s}"
    losses = [e["mean_loss"] for e in epochs]
    assert all(np.isfinite(losses)) and losses[-1] < losses[0], \
        f"loss did not improve: {losses}"

    samples = sum(e["samples"] for e in epochs)
    wall = sum(e["wall_s"] for e in epochs)
    print(json.dumps({
        "metric": "soak: flagship sustained train samples/sec "
                  "(real input pipeline, uint8 charts, eval+ckpt/epoch, "
                  f"kill+resume at epoch {kill_epoch})",
        "value": round(samples / wall, 2), "unit": "samples/sec",
        "vs_baseline": None,
        "epochs": args.epochs, "p50_ms": p50s, "rss_mb": epochs[-1]["rss_mb"],
        "val_f1_curve": [e["val_f1"] for e in epochs],
        "test_f1": done[0]["test_f1"]}))
    print("SOAK PASS")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--n", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nec", type=int, default=12,
                    help="encoder depth (the flagship soak runs 12; small "
                         "values exist for CPU smoke of the driver logic)")
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--epoch", type=int, default=0,
                    help="resume from this epoch's checkpoint (worker)")
    ap.add_argument("--kill_at_epoch", type=int, default=-1)
    ap.add_argument("--kill_at_step", type=int, default=-1)
    ap.add_argument("--out", default="/tmp/meant_soak")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        driver(args)


if __name__ == "__main__":
    main()
