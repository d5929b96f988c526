"""Worker for the TRUE multi-process DP smoke test.

Launched N times by `tests/test_multiprocess.py` (and usable standalone for
manual pod rehearsal). Each process initializes jax.distributed against a
shared coordinator, owns 4 virtual CPU devices of an 8-device global mesh,
and feeds ONLY its rows of the global batch through
`meant_tpu.parallel.shard_batch` — the `jax.process_count() > 1` branch
that single-process tests can't reach (`parallel/mesh.py:110-128`). One
AdamW step on a small MLP; process 0 writes loss + grad/param norms to
--out for comparison against the single-process ground truth.

On a real pod the launcher (SLURM in the reference's world —
`/root/reference/src/run.sh`) provides process_id/coordinator; here the
test passes them explicitly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--out", default="")
    ap.add_argument("--trainer", action="store_true",
                    help="drive the REAL meant_trainer train step instead "
                         "of the minimal MLP")
    ap.add_argument("--fsdp", action="store_true",
                    help="with --trainer: shard params + Adam moments over "
                         "the data axis (ZeRO-3) across the two processes")
    ap.add_argument("--hybrid", action="store_true",
                    help="dp x tp on a (dcn, model) mesh: DP across the "
                         "process boundary, megatron TP inside each "
                         "process — the real pod layout")
    ap.add_argument("--ring", action="store_true",
                    help="sequence-parallel LanguageEncoder: the ring's "
                         "ppermute hops cross the process boundary")
    ap.add_argument("--ckpt_dir", default="",
                    help="with --trainer: orbax save + restore the (FSDP-"
                         "sharded) state through this shared directory and "
                         "assert the round-trip is exact")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}")
    # the persistent compile cache is keyed per platform but a cpu process
    # under an axon-pinned env must not touch the axon cache dir
    os.environ["MEANT_TPU_NO_COMPILE_CACHE"] = "1"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, \
        f"global devices {len(jax.devices())} != {n_global}"

    import numpy as np
    import jax.numpy as jnp
    import optax

    from meant_tpu.parallel import make_mesh, replicate_tree, shard_batch

    mesh = make_mesh(("data",))

    if args.hybrid:
        _hybrid_mode(args)
        jax.distributed.shutdown()
        return
    if args.ring:
        _ring_mode(args, mesh)
        jax.distributed.shutdown()
        return
    if args.trainer:
        _trainer_mode(args, mesh)
        jax.distributed.shutdown()
        return

    # deterministic global problem — every process derives the SAME params
    # and the SAME global batch, then keeps only its local rows
    rng = np.random.RandomState(0)
    B, D, H = 16, 12, 8
    xs = rng.randn(B, D).astype(np.float32)
    ys = (rng.randn(B) > 0).astype(np.int32)
    params = {
        "w1": jnp.asarray(rng.randn(D, H).astype(np.float32) * 0.3),
        "b1": jnp.zeros((H,), jnp.float32),
        "w2": jnp.asarray(rng.randn(H, 2).astype(np.float32) * 0.3),
        "b2": jnp.zeros((2,), jnp.float32),
    }
    rows = B // args.num_processes
    lo = args.process_id * rows
    local = {"x": xs[lo:lo + rows], "y": ys[lo:lo + rows]}

    opt = optax.adamw(1e-2)

    def loss_fn(p, batch):
        h = jnp.tanh(batch["x"] @ p["w1"] + p["b1"])
        logits = h @ p["w2"] + p["b2"]
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(lp, batch["y"][:, None],
                                             axis=1))

    @jax.jit
    def step(p, ostate, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, ostate = opt.update(grads, ostate, p)
        p = optax.apply_updates(p, updates)
        gnorm = optax.global_norm(grads)
        return p, ostate, loss, gnorm

    with mesh:
        gparams = replicate_tree(params, mesh)
        gostate = replicate_tree(opt.init(params), mesh)
        gbatch = shard_batch(local, mesh)      # process-local rows in,
        assert gbatch["x"].shape[0] == B       # GLOBAL batch out
        gparams, gostate, loss, gnorm = step(gparams, gostate, gbatch)
        pnorm = optax.global_norm(gparams)

    out = {"loss": float(loss), "gnorm": float(gnorm),
           "pnorm": float(pnorm), "process_count": jax.process_count(),
           "global_devices": len(jax.devices())}
    print(f"[p{args.process_id}] {out}", flush=True)
    if args.out and args.process_id == 0:
        np.savez(args.out, **out)
    jax.distributed.shutdown()


def make_trainer_problem(num_processes: int, process_id: int, mesh,
                         fsdp: bool = False):
    """The dryrun_multichip model at 2-encoder geometry; each process keeps
    only its rows of the deterministic global batch. process_id=-1 (and
    num_processes=1) returns the WHOLE batch — the single-process ground
    truth uses the same builder so the two computations differ only in
    launch topology."""
    import numpy as np

    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.train import meant_trainer

    emb = EmbeddingConfig(vocab_size=128, hidden_size=64,
                          max_position_embeddings=40, dropout=0.0)
    B, lag, s = 16, 5, 16
    model = meant(text_dim=64, image_dim=64, price_dim=4, height=32,
                  width=32, patch_res=16, lag=lag, num_classes=2,
                  embedding=emb, num_heads=8, num_encoders=2)
    rng = np.random.RandomState(0)
    data = {
        "tweets": rng.randint(2, 128, size=(B, lag, s)).astype(np.int32),
        "graphs": rng.randn(B, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((B, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(B,)).astype(np.int32),
    }
    rows = B // num_processes
    lo = 0 if process_id < 0 else process_id * rows
    local = {k: v[lo:lo + (B if process_id < 0 else rows)]
             for k, v in data.items()}
    trainer = meant_trainer({
        "model": model, "model_name": "meant", "dataset": "Tempstock",
        "train_loader": ArrayLoader(local, len(local["y"])),
        "epochs": 1, "num_classes": 2, "lag": lag, "mesh": mesh,
        "test_model": False, "run_id": "mp_smoke", "lrst": "constant",
        "fsdp": fsdp,
    })
    return trainer, local


def hybrid_problem():
    """Flagship-shaped LanguageEncoder + deterministic batch for the
    dp(dcn) × tp(model) leg; both the workers and the single-process
    ground truth build the identical problem from this."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from meant_tpu.nn.encoders import LanguageEncoder

    d, h, s, B = 64, 4, 32, 8
    enc = LanguageEncoder(d, h, ff_dropout=0.0, rot_dim=d // h // 2)
    rng = np.random.RandomState(0)
    x = rng.randn(B, s, d).astype(np.float32) * 0.5
    mask = np.ones((B, s), np.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(mask))["params"]

    def loss(p, x_, m_):
        return jnp.mean(enc.apply({"params": p}, x_, m_) ** 2)

    return params, x, mask, loss, B


def _hybrid_mode(args):
    """dp × tp across the REAL process boundary: (dcn=2, model=4) mesh
    whose dcn rows coincide with the two processes — megatron TP
    collectives stay INSIDE a process (they'd ride ICI on a pod; crossing
    DCN per layer is the regression make_hybrid_mesh exists to prevent),
    the once-per-step gradient allreduce crosses it."""
    import numpy as np
    import optax

    import jax

    from meant_tpu.parallel import make_hybrid_mesh, shard_batch, \
        shard_params

    mesh = make_hybrid_mesh(ici_axes=("model",), ici_shape=(4,),
                            num_slices=2)
    # the claim on the box: each dcn row is one process
    for i in range(2):
        owners = {d.process_index for d in mesh.devices[i].flat}
        assert owners == {i}, \
            f"dcn row {i} spans processes {owners} — TP would cross DCN"

    params, x, mask, loss, B = hybrid_problem()
    rows = B // args.num_processes
    lo = args.process_id * rows
    sharded = shard_params(params, mesh)
    n_tp = sum(1 for leaf in jax.tree.leaves(sharded)
               if "model" in str(leaf.sharding.spec))
    assert n_tp > 0, "no param sharded over the ici 'model' axis"
    with mesh:
        xb = shard_batch({"x": x[lo:lo + rows], "m": mask[lo:lo + rows]},
                         mesh)
    assert xb["x"].shape[0] == B
    lval, grads = jax.jit(jax.value_and_grad(loss))(sharded, xb["x"],
                                                    xb["m"])
    out = {"loss": float(lval), "gnorm": float(optax.global_norm(grads)),
           "n_tp": n_tp, "process_count": jax.process_count(),
           "global_devices": len(jax.devices())}
    print(f"[p{args.process_id}] hybrid {out}", flush=True)
    if args.out and args.process_id == 0:
        np.savez(args.out, **out)


def ring_problem():
    """Sequence-parallel encoder problem shared by the workers and the
    single-process ground truth: b=2, s=256 (32 rows per device on the
    8-device mesh), a padding tail in the mask so the ring's kmask
    rotation is exercised too."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from meant_tpu.nn.encoders import LanguageEncoder

    d, h, s = 32, 4, 256
    rng = np.random.RandomState(8)
    x = (rng.randn(2, s, d).astype(np.float32) * 0.5)
    mask = np.ones((2, s), np.float32)
    mask[0, 200:] = 0
    dense = LanguageEncoder(d, h)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask))

    def loss_with(enc, p, x_, m_):
        return jnp.mean(enc.apply(p, x_, m_) ** 2)

    return dense, params, x, mask, loss_with, d, h, s


def _ring_mode(args, mesh):
    """Sequence parallelism across the REAL process boundary: activations
    sequence-sharded over all 8 devices of the 2-process mesh, the in-model
    ring attention's ppermute hops crossing between processes (DCN on a
    pod — the layout long-context SP actually uses)."""
    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from meant_tpu.nn.encoders import LanguageEncoder

    dense, params, x, mask, loss_with, d, h, s = ring_problem()
    ring_enc = LanguageEncoder(d, h, ring_mesh=mesh, ring_axis="data")

    # this process holds the MIDDLE slice of the sequence it owns: rows
    # for its 4 of the 8 'data' shards
    s_loc = s // args.num_processes
    lo = args.process_id * s_loc
    xs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, "data", None)),
        x[:, lo:lo + s_loc])
    ms = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, "data")), mask[:, lo:lo + s_loc])
    assert xs.shape == (2, s, d)

    lval, grads = jax.jit(jax.value_and_grad(
        lambda p, x_, m_: loss_with(ring_enc, p, x_, m_)))(params, xs, ms)
    out = {"loss": float(lval), "gnorm": float(optax.global_norm(grads)),
           "process_count": jax.process_count(),
           "global_devices": len(jax.devices())}
    print(f"[p{args.process_id}] ring {out}", flush=True)
    if args.out and args.process_id == 0:
        np.savez(args.out, **out)


def _trainer_mode(args, mesh):
    """One REAL meant_trainer._jit_train step, multi-process: params init
    deterministically per process (same seed), the process-local batch rows
    assemble into the global sharded batch inside _device_batch
    (`train/classify.py:234`), and the replicated loss is read locally."""
    import jax
    import numpy as np
    import optax

    trainer, local = make_trainer_problem(args.num_processes,
                                          args.process_id, mesh,
                                          fsdp=args.fsdp)
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    trainer._build_steps()
    db = trainer._device_batch(batch)
    B_global = 16
    assert db["y"].shape[0] == B_global, db["y"].shape
    n_sharded = 0
    if args.fsdp:
        # the big kernels must be PHYSICALLY sharded: their local shard on
        # this process's devices is smaller than the global leaf
        for leaf in jax.tree.leaves(trainer.state.params):
            shards = leaf.addressable_shards
            if shards and shards[0].data.shape != leaf.shape:
                n_sharded += 1
        assert n_sharded > 0, "fsdp=True but no leaf is physically sharded"
    state, loss, cm = trainer._jit_train(trainer.state, db)
    ckpt_diff = -1.0
    if args.ckpt_dir:
        # orbax multi-process round-trip of the (possibly FSDP-sharded)
        # post-step state: every process participates in the save (its
        # local shards only), restore against the live state's shardings,
        # compare local shards bit-for-bit
        from meant_tpu.train import checkpoint as ckpt
        tree = {"params": state.params, "opt": state.opt_state}
        ckpt.save(args.ckpt_dir, tree)
        restored = ckpt.restore(args.ckpt_dir, target=tree)

        def shard_diff(a, b):
            return float(max(
                (np.abs(np.asarray(sa.data, np.float64)
                        - np.asarray(sb.data, np.float64)).max()
                 for sa, sb in zip(a.addressable_shards,
                                   b.addressable_shards)), default=0.0))

        ckpt_diff = max(jax.tree.leaves(jax.tree.map(
            shard_diff, tree, restored)) or [0.0])
        assert ckpt_diff == 0.0, \
            f"checkpoint round-trip not exact: {ckpt_diff}"
    out = {"loss": float(loss),
           "pnorm": float(optax.global_norm(state.params)),
           "cm_sum": float(np.asarray(cm).sum()),
           "n_sharded": n_sharded, "ckpt_diff": ckpt_diff,
           "process_count": jax.process_count(),
           "global_devices": len(jax.devices())}
    print(f"[p{args.process_id}] trainer {out}", flush=True)
    if args.out and args.process_id == 0:
        np.savez(args.out, **out)


if __name__ == "__main__":
    main()
