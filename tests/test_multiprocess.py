"""TRUE multi-process data parallelism: 2 processes × 4 virtual CPU devices.

`parallel.shard_batch`/`replicate_tree` have a `jax.process_count() > 1`
branch (the real-pod input path, `parallel/mesh.py:110-140`) that in-suite
tests can only pin for single-process equivalence. This test launches two
actual processes under `jax.distributed` — each holding ONLY its rows of
the global batch — runs one AdamW step over the 8-device global mesh, and
asserts the loss/grad-norm/updated-param-norm equal the single-process
ground truth computed in-suite.

This is the CPU rehearsal of the reference's multi-host story (the
reference has none — its only strategy is single-site nn.DataParallel,
SURVEY.md §2.7); on a pod the same code runs with SLURM providing the
process topology.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # 2-process jax.distributed legs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multiprocess_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _ground_truth():
    """The worker's computation, single-process (this suite already runs
    with 8 virtual CPU devices — same global mesh, whole batch local)."""
    import jax
    import jax.numpy as jnp
    import optax

    from meant_tpu.parallel import make_mesh, replicate_tree, shard_batch

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
        return p, ostate, loss, optax.global_norm(grads)

    mesh = make_mesh(("data",))
    with mesh:
        gp = replicate_tree(params, mesh)
        go = replicate_tree(opt.init(params), mesh)
        gb = shard_batch({"x": xs, "y": ys}, mesh)
        gp, go, loss, gnorm = step(gp, go, gb)
        pnorm = optax.global_norm(gp)
    return float(loss), float(gnorm), float(pnorm)


@pytest.mark.skipif(sys.platform != "linux", reason="needs fork + localhost")
def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "p0.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(i),
             "--num_processes", "2",
             "--coordinator", f"127.0.0.1:{port}",
             "--out", str(out) if i == 0 else ""],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(o)
    for i, (p, o) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o[-3000:]}"

    got = np.load(out)
    assert int(got["process_count"]) == 2
    assert int(got["global_devices"]) == 8
    want_loss, want_gnorm, want_pnorm = _ground_truth()
    np.testing.assert_allclose(float(got["loss"]), want_loss, rtol=1e-6)
    np.testing.assert_allclose(float(got["gnorm"]), want_gnorm, rtol=1e-5)
    np.testing.assert_allclose(float(got["pnorm"]), want_pnorm, rtol=1e-5)


def _run_trainer_workers(tmp_path, extra, timeout=420):
    port = _free_port()
    out = tmp_path / "p0t.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(i),
             "--num_processes", "2", "--trainer", *extra,
             "--coordinator", f"127.0.0.1:{port}",
             "--out", str(out) if i == 0 else ""],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process trainer workers timed out")
        logs.append(o)
    for i, (p, o) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o[-3000:]}"
    return np.load(out)


def _single_process_truth():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from multiprocess_worker import make_trainer_problem
    finally:
        sys.path.pop(0)
    import optax

    from meant_tpu.parallel import make_mesh

    trainer, _ = make_trainer_problem(1, -1, make_mesh(("data",)))
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    trainer._build_steps()
    state, loss, _cm = trainer._jit_train(trainer.state,
                                          trainer._device_batch(batch))
    return float(loss), float(optax.global_norm(state.params))


@pytest.mark.skipif(sys.platform != "linux", reason="needs fork + localhost")
def test_two_process_real_trainer_step_matches_single_process(tmp_path):
    """The REAL meant_trainer: params init per-process from the same seed,
    process-local batch rows assemble into the global batch inside
    _device_batch, one _jit_train step — loss/updated-param-norm equal the
    single-process run of the identical problem."""
    got = _run_trainer_workers(tmp_path, [])
    assert int(got["process_count"]) == 2
    want_loss, want_pnorm = _single_process_truth()
    np.testing.assert_allclose(float(got["loss"]), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(got["pnorm"]), want_pnorm, rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="needs fork + localhost")
def test_two_process_hybrid_dp_tp(tmp_path):
    """dp × tp with the DCN axis ON the process boundary: each of the
    (dcn=2, model=4) mesh's rows is one process (the worker asserts it —
    megatron TP collectives stay intra-process, as they must stay on ICI
    on a pod), params megatron-sharded over 'model', batch over 'dcn';
    loss + grad norm equal the single-process computation."""
    port = _free_port()
    out = tmp_path / "p0h.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(i),
             "--num_processes", "2", "--hybrid",
             "--coordinator", f"127.0.0.1:{port}",
             "--out", str(out) if i == 0 else ""],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("hybrid workers timed out")
        logs.append(o)
    for i, (p, o) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o[-3000:]}"

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from multiprocess_worker import hybrid_problem
    finally:
        sys.path.pop(0)
    import jax
    import jax.numpy as jnp
    import optax

    params, x, mask, loss, _B = hybrid_problem()
    lval, grads = jax.value_and_grad(loss)(params, jnp.asarray(x),
                                           jnp.asarray(mask))
    got = np.load(out)
    assert int(got["process_count"]) == 2
    assert int(got["n_tp"]) > 0
    np.testing.assert_allclose(float(got["loss"]), float(lval), rtol=1e-6)
    np.testing.assert_allclose(float(got["gnorm"]),
                               float(optax.global_norm(grads)), rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="needs fork + localhost")
def test_two_process_ring_sequence_parallel(tmp_path):
    """Sequence-parallel LanguageEncoder with the ring's ppermute hops
    crossing the REAL process boundary (DCN on a pod): activations
    sequence-sharded over the 8 devices of the 2-process mesh, loss +
    param-grad norm equal the dense single-process encoder."""
    port = _free_port()
    out = tmp_path / "p0r.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--process_id", str(i),
             "--num_processes", "2", "--ring",
             "--coordinator", f"127.0.0.1:{port}",
             "--out", str(out) if i == 0 else ""],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("ring workers timed out")
        logs.append(o)
    for i, (p, o) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o[-3000:]}"

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from multiprocess_worker import ring_problem
    finally:
        sys.path.pop(0)
    import jax
    import jax.numpy as jnp
    import optax

    dense, params, x, mask, loss_with, *_ = ring_problem()
    lval, grads = jax.value_and_grad(
        lambda p: loss_with(dense, p, jnp.asarray(x), jnp.asarray(mask)))(
            params)
    got = np.load(out)
    assert int(got["process_count"]) == 2
    np.testing.assert_allclose(float(got["loss"]), float(lval), rtol=1e-5)
    np.testing.assert_allclose(float(got["gnorm"]),
                               float(optax.global_norm(grads)), rtol=1e-4)


@pytest.mark.skipif(sys.platform != "linux", reason="needs fork + localhost")
def test_two_process_fsdp_trainer_step_and_checkpoint(tmp_path):
    """FSDP/ZeRO-3 across PROCESS boundaries: params + Adam moments
    physically sharded over the 8 devices of the 2-process mesh (the
    worker asserts local shards are smaller than the global leaves), one
    train step, loss == the replicated single-process run — then an orbax
    multi-process checkpoint round-trip of the sharded state (every
    process writes its local shards; restore is asserted exact in the
    worker)."""
    got = _run_trainer_workers(
        tmp_path, ["--fsdp", "--ckpt_dir", str(tmp_path / "ckpt")],
        timeout=540)
    assert int(got["process_count"]) == 2
    assert int(got["n_sharded"]) > 0
    assert float(got["ckpt_diff"]) == 0.0
    want_loss, want_pnorm = _single_process_truth()
    np.testing.assert_allclose(float(got["loss"]), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(got["pnorm"]), want_pnorm, rtol=1e-5)
