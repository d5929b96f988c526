"""Benchmark: MEANT-12 training throughput (samples/sec/chip).

Default workload = the honest baseline match: the SRC-ERA meant
(`/root/reference/src/meant/meant.py:197-311` — 3-channel 224^2 charts,
512-cap text, learned-projection fusion, 12+12 encoders) trained on
TempStockLarge-shaped data at batch 16, which is exactly what produced the
A100 baseline of ~1.42-1.44 it/s @ batch 16 => ~23 samples/s/GPU
(`/root/reference/src/slurm-42756024.out`). Text is padded to the FULL
512 cap — the reference used dynamic padding (content usually shorter), so
this is a conservative floor for the vs_baseline ratio.

Other workloads (--workload): `paper128` = the paper-generation meant at
TempStock-small shapes (128-token tweets, 4-channel images); `src256` =
src model at half text padding.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_SEC = 23.0

# The A100 baseline (~23 samples/s) was measured on the src-era s=512
# dynamic-padding workload; only the two workloads that replicate it get a
# vs_baseline ratio. paper128/src256 run different shapes — a ratio against
# the s=512 number would overstate them (VERDICT r2 "What's weak" #5).
BASELINED_WORKLOADS = ("src512", "src_bucketed")


def build_paper128():
    from meant_tpu.models import EmbeddingConfig, meant

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
    metric = "TempStock(paper meant-12) train samples/sec/chip (s=128, bf16)"
    return model, "meant", data, b, metric


def build_src(seq_len: int, batch: int = 16, fixed_proj: bool = False,
              num_encoders: int = 12, remat=False, scan_layers: bool = False):
    from meant_tpu.models import EmbeddingConfig
    from meant_tpu.models.meant_src import meant_src

    b, lag, s = batch, 5, seq_len
    model = meant_src(text_dim=768, image_dim=768, price_dim=5, height=224,
                      width=224, patch_res=16, lag=lag, num_classes=2,
                      embedding=EmbeddingConfig(), num_heads=8,
                      num_encoders=num_encoders, channels=3, seq_len=512,
                      flash=True, fixed_proj=fixed_proj, remat=remat,
                      scan_layers=scan_layers,
                      dtype=jnp.bfloat16)  # flash on BOTH branches: with
    # auto-sized q blocks the kernel now also edges XLA at the 196-patch
    # vision length (27.7 vs 29.0 ms/4-layer grad; 53.5 vs 52.5 samples/s
    # end-to-end)
    rng = np.random.RandomState(0)
    data = {
        "input_ids": rng.randint(2, 64000, size=(b, lag, s)).astype(np.int32),
        "pixels": rng.randn(b, lag, 3, 224, 224).astype(np.float32),
        "prices": rng.randn(b, lag, 5).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }
    # the label records the config that actually RAN: a scanned tower always
    # remats (models/meant._lang_tower defaults the policy to 'dots')
    eff_remat = remat if remat else ("dots" if scan_layers else False)
    metric = (f"TempStockLarge(src meant-{num_encoders}) train "
              f"samples/sec/chip (s={s} full padding, bf16, flash"
              + (f", remat={eff_remat}" if eff_remat else "")
              + (", scan_layers" if scan_layers else "") + ")")
    return model, "meant_src", data, b, metric


def build_src_bucketed(batch: int = 16, n: int = 256,
                       fixed_proj: bool = False, remat=False,
                       scan_layers: bool = False,
                       bucket_batches=None):
    """src model fed through the length-bucketed loader with a SIMULATED
    dynamic-length text distribution (uniform 64..512 content tokens) —
    comparable to the reference's dynamic per-batch padding, one jit
    compile per bucket length. `bucket_batches` (dict bucket->batch)
    additionally runs short buckets at larger batches — a constant token
    budget; s=512 keeps the measured b=16 optimum."""
    from meant_tpu.data.loader import BucketedLoader

    model, name, data, b, _ = build_src(512, batch, fixed_proj=fixed_proj,
                                        remat=remat,
                                        scan_layers=scan_layers)
    rng = np.random.RandomState(7)
    b_max = max([b] + list((bucket_batches or {}).values()))
    # the shortest bucket holds ~14% of uniform-64..512 lengths; 10x the
    # largest batch keeps every bucket able to fill at least one full batch
    n = max(n, 10 * b_max)
    n = (n // b) * b   # keep rows == mask rows when b doesn't divide n
    data = {k: np.repeat(v, n // b, axis=0) for k, v in data.items()}
    lengths = rng.randint(64, 513, size=n)
    mask = np.zeros((n, 5, 512), np.float32)
    for i, l in enumerate(lengths):
        mask[i, :, :l] = 1
    data["attention_masks"] = mask
    loader = BucketedLoader(data, b, buckets=(128, 256, 384, 512),
                            shuffle=False, bucket_batches=bucket_batches)
    metric = ("TempStockLarge(src meant-12) train samples/sec/chip "
              "(length-bucketed, simulated uniform 64-512 content, bf16"
              + (", token-budget batches" if bucket_batches else "") + ")")
    return model, name, loader, b, metric


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="src512",
                    choices=["src512", "src256", "paper128",
                             "src_bucketed", "src512_large"])
    ap.add_argument("--batch", type=int, default=None,
                    help="override the workload's default batch size")
    ap.add_argument("--remat", nargs="?", const="full", default=False,
                    choices=["full", "dots"],
                    help="rematerialize encoder blocks (trades FLOPs for "
                         "HBM — the lever that fits meant-LARGE at s=512). "
                         "Bare --remat = 'full' (save nothing); "
                         "--remat dots = selective (matmul outputs saved, "
                         "elementwise tail recomputed; nn/stack.py)")
    ap.add_argument("--scan_layers", action="store_true",
                    help="roll each encoder tower into ONE lax.scan over "
                         "layer-stacked params: O(1)-in-depth program size "
                         "and compile time (the deep-config lever — "
                         "meant-30 compiles 60 block copies without it)")
    ap.add_argument("--budget_buckets", action="store_true",
                    help="with --workload src_bucketed: run short buckets "
                         "at LARGER batches (constant token budget) instead "
                         "of one fixed batch — per-bucket sizes from the "
                         "on-chip sweep in scripts/probe_bucket_batch.py")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--with-input", dest="with_input", action="store_true",
                    help="feed the step through the REAL input pipeline "
                         "(Prefetcher overlapping host collate + H2D) "
                         "instead of replaying a device-resident batch. "
                         "Demonstrates overlap; the absolute number is NOT "
                         "representative on this sandbox (the tunneled TPU "
                         "moves H2D at ~25 MB/s vs PCIe's ~10s of GB/s), so "
                         "vs_baseline is omitted")
    ap.add_argument("--uint8_charts", action="store_true",
                    help="with --with-input: ship charts as uint8 "
                         "(normalize-on-device storage layout, 4x less "
                         "host IO and H2D)")
    ap.add_argument("--eval", dest="eval_mode", action="store_true",
                    help="measure the EVAL step (forward + loss + "
                         "confusion-matrix delta, no backward/optimizer) "
                         "instead of training — the serving/validation "
                         "path. vs_baseline omitted (the A100 number is a "
                         "training rate)")
    ap.add_argument("--int8", action="store_true",
                    help="with --eval: run wide Dense layers on the int8 "
                         "MXU (nn/quant.py). vs_baseline stays omitted")
    ap.add_argument("--mu_bf16", action="store_true",
                    help="store the first Adam moment in bf16 (halves its "
                         "HBM footprint + optimizer-pass traffic; parity "
                         "config keeps fp32 moments)")
    ap.add_argument("--fixed_proj", action="store_true",
                    help="repaired lang/image projection (LayerNorm(1) "
                         "dropped, DEFECTS #15) instead of the bug-faithful "
                         "default. Same matmul shapes; measured ~5% slower "
                         "(51.2 vs 54.1) because the degenerate default's "
                         "constant projection lets XLA dead-code some "
                         "tower gradients — the repaired model pays for "
                         "gradients that actually flow")
    args = ap.parse_args()

    from meant_tpu.data import ArrayLoader
    from meant_tpu.parallel import make_mesh
    from meant_tpu.train import meant_trainer

    loader = data = None
    # Refuse rather than silently mislabel: the emitted JSON is this repo's
    # measurement record — it must never claim a config that didn't run.
    if (args.fixed_proj or args.remat or args.batch or args.scan_layers) \
            and args.workload == "paper128":
        raise SystemExit("--fixed_proj/--remat/--scan_layers/--batch are not "
                         "supported by the paper128 workload (paper-era "
                         "model, fixed b=16)")
    if args.eval_mode and (args.with_input or args.workload == "src_bucketed"):
        raise SystemExit("--eval measures the device-resident eval step; it "
                         "does not compose with --with-input or the "
                         "src_bucketed workload")
    if args.int8 and not args.eval_mode:
        raise SystemExit("--int8 only applies to the eval path; pass --eval")
    if args.uint8_charts and not args.with_input:
        raise SystemExit("--uint8_charts only applies to the real input "
                         "pipeline; pass --with-input")
    if args.budget_buckets and args.workload != "src_bucketed":
        raise SystemExit("--budget_buckets is a bucketed-loader policy; "
                         "pass --workload src_bucketed")
    if args.mu_bf16 and args.eval_mode:
        raise SystemExit("--mu_bf16 changes optimizer-state dtype; the eval "
                         "step runs no optimizer")
    if args.workload == "paper128":
        model, name, data, b, metric = build_paper128()
    elif args.workload == "src256":
        model, name, data, b, metric = build_src(
            256, batch=args.batch or 16, fixed_proj=args.fixed_proj,
            remat=args.remat, scan_layers=args.scan_layers)
    elif args.workload == "src_bucketed":
        model, name, loader, b, metric = build_src_bucketed(
            batch=args.batch or 16, fixed_proj=args.fixed_proj,
            remat=args.remat, scan_layers=args.scan_layers,
            bucket_batches=BUDGET_BUCKET_BATCHES if args.budget_buckets
            else None)
    elif args.workload == "src512_large":
        # the paper's Table-1 98.57% geometry (30+30 encoders,
        # `meant_tex.pdf`) on the src-era s=512 workload
        model, name, data, b, metric = build_src(
            512, batch=args.batch or 8, num_encoders=30,
            fixed_proj=args.fixed_proj, remat=args.remat,
            scan_layers=args.scan_layers)
    else:
        model, name, data, b, metric = build_src(
            512, batch=args.batch or 16, fixed_proj=args.fixed_proj,
            remat=args.remat, scan_layers=args.scan_layers)
    if args.fixed_proj:
        metric += " [fixed_proj]"
    if loader is None:
        loader = ArrayLoader(data, b)

    mesh = make_mesh()
    n_chips = len(jax.devices())
    trainer = meant_trainer({
        "model": model, "model_name": name, "dataset": "TempStockLarge",
        "train_loader": loader, "epochs": 1,
        "num_classes": 2, "lag": 5, "mesh": mesh, "test_model": False,
        "run_id": "bench", "lrst": "constant", "lr": 1e-5,
        "mu_dtype": jnp.bfloat16 if args.mu_bf16 else None,
    })
    if args.mu_bf16:
        metric += " [mu_bf16]"
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    trainer._build_steps()

    # compile + warmup. NOTE: on the tunneled TPU platform
    # jax.block_until_ready can return before execution completes — fetching
    # the scalar value is the only reliable completion barrier, so timings
    # below close with float(loss).
    if args.with_input:
        # REAL pipeline: host batches flow through the Prefetcher (collate
        # thread + H2D staging overlapped with compute) every step.
        from meant_tpu.data.loader import Prefetcher
        if data is not None:
            if args.uint8_charts and "pixels" in data:
                data["pixels"] = np.clip(
                    (data["pixels"] - data["pixels"].min()) * 40, 0,
                    255).astype(np.uint8)
            # widen the single synthetic batch into an epoch of batches so
            # the loop exercises sustained pipeline flow (epoch bounded at 8
            # batches for host RAM; --steps beyond that cycles epochs below)
            reps = min(max(args.steps + 1, 2), 8)
            data = {k: np.repeat(v, reps, axis=0) for k, v in data.items()}
            loader = ArrayLoader(data, b)
            trainer.train_loader = loader
        it = iter(Prefetcher(loader, trainer._device_batch))
        db0 = next(it)
        trainer.state, loss, cm = trainer._jit_train(trainer.state, db0)
        float(loss)   # compile barrier
        steps = 0
        t0 = time.perf_counter()
        while steps < args.steps:
            for db in it:
                trainer.state, loss, cm = trainer._jit_train(trainer.state,
                                                             db)
                steps += 1
                if steps >= args.steps:
                    break
            else:   # epoch exhausted below --steps: restart the pipeline
                it = iter(Prefetcher(loader, trainer._device_batch))
        float(loss)
        dt = time.perf_counter() - t0
        metric += " [with-input%s]" % ("+u8" if args.uint8_charts else "")
    elif args.workload == "src_bucketed":
        # Pre-stage ONE device batch per bucket and replay the epoch's
        # bucket sequence. Timing excludes host->device transfer: over the
        # sandbox's tunneled TPU it runs at ~25 MB/s and would swamp the
        # measurement (production hosts feed over PCIe; the Prefetcher
        # overlaps it with compute either way). Staging every batch OOMs
        # HBM next to params+opt state, so one exemplar per shape stands in.
        per_bucket = {}
        bucket_rows = {}
        sequence = []
        for hb in loader:
            s_b = hb["input_ids"].shape[-1]
            if s_b not in per_bucket:
                per_bucket[s_b] = trainer._device_batch(hb)
                bucket_rows[s_b] = len(hb["y"])
            sequence.append(s_b)
        for db in per_bucket.values():   # compile each bucket shape
            trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
        float(loss)
        steps = samples = 0
        t0 = time.perf_counter()
        for _ in range(2):
            for s_b in sequence:
                trainer.state, loss, cm = trainer._jit_train(
                    trainer.state, per_bucket[s_b])
                steps += 1
                samples += bucket_rows[s_b]   # batches vary per bucket
                # under --budget_buckets; count rows, not steps*b
        float(loss)
        dt = time.perf_counter() - t0
        b = samples / steps   # make the shared steps*b/dt tail exact
    elif args.eval_mode:
        db = dict(trainer._device_batch(batch))
        db.setdefault("_weight", jnp.ones((b,), jnp.float32))
        import contextlib
        if args.int8:
            # the interceptor rewrites the graph at TRACE time, so the
            # compile calls run inside the context; the timed loop replays
            # the already-compiled quantized executable (shapes are fixed)
            from meant_tpu.nn.quant import int8_inference
            ctx = int8_inference
        else:
            ctx = contextlib.nullcontext
        with ctx():
            for _ in range(3):   # compile + warm
                loss, cm, out = trainer._jit_eval(trainer.state, db)
            float(loss)
            steps = args.steps
            t0 = time.perf_counter()
            for _ in range(steps):
                loss, cm, out = trainer._jit_eval(trainer.state, db)
            float(loss)
            dt = time.perf_counter() - t0
        metric += " [eval+int8]" if args.int8 else " [eval]"
    else:
        db = trainer._device_batch(batch)
        state, loss, cm = trainer._jit_train(trainer.state, db)
        trainer.state = state
        loss_first = float(loss)
        for _ in range(2):
            trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
        float(loss)

        steps = args.steps
        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.state, loss, cm = trainer._jit_train(trainer.state, db)
        loss_last = float(loss)  # true barrier: value arrives only after
        dt = time.perf_counter() - t0  # the chain
        print(f"loss: step0 {loss_first:.4f} -> step{steps + 3} "
              f"{loss_last:.4f} (single replayed batch)", file=sys.stderr)

    samples_per_sec = steps * b / dt
    per_chip = samples_per_sec / max(n_chips, 1)
    vs = (round(per_chip / BASELINE_SAMPLES_PER_SEC, 3)
          if args.workload in BASELINED_WORKLOADS and not args.with_input
          and not args.eval_mode else None)
    print(json.dumps({
        "metric": metric,
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
