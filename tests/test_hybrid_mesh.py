"""Multi-slice (DCN x ICI) mesh layout: DP over the slice axis, megatron TP
inside the slice. On real fleets the leading 'dcn' axis crosses slices over
the data-center network and 'model' rides the ICI torus; the CPU mesh
emulates the same axis layout (2 slices x 4 chips), so what these tests pin
is the SEMANTICS — axis order, sharding specs, collective math — which is
exactly what transfers to hardware (SURVEY §2.7 "optional DCN axis")."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-slice mesh integration legs

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from meant_tpu.parallel import (batch_sharding, make_hybrid_mesh,
                                shard_params)


def test_hybrid_mesh_axes():
    mesh = make_hybrid_mesh(ici_axes=("model",), ici_shape=(4,),
                            num_slices=2)
    assert mesh.axis_names == ("dcn", "model")
    assert mesh.devices.shape == (2, 4)


def test_dp_over_dcn_tp_over_ici_matches_single_device():
    """Flagship-shaped linen module: batch sharded over 'dcn', params
    megatron-sharded over 'model'; loss + grads must equal the
    single-device computation."""
    from meant_tpu.nn.encoders import LanguageEncoder

    mesh = make_hybrid_mesh(ici_axes=("model",), ici_shape=(4,),
                            num_slices=2)
    d, h, s, b = 64, 4, 32, 8
    enc = LanguageEncoder(d, h, ff_dropout=0.0, rot_dim=d // h // 2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, d).astype(np.float32) * 0.5)
    mask = jnp.ones((b, s), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x, mask)["params"]

    def loss(p, x_, m_):
        return jnp.mean(enc.apply({"params": p}, x_, m_) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, x, mask)

    sharded = shard_params(params, mesh)
    xs = jax.device_put(x, batch_sharding(mesh, "dcn"))
    ms = jax.device_put(mask, batch_sharding(mesh, "dcn"))
    l1, g1 = jax.jit(jax.value_and_grad(loss))(sharded, xs, ms)

    assert abs(float(l0) - float(l1)) < 1e-6
    diffs = jax.tree.map(
        lambda a, b_: float(np.max(np.abs(np.asarray(a) - np.asarray(b_)))),
        g0, g1)
    assert max(jax.tree.leaves(diffs)) < 1e-5

    # the TP rules actually sharded something over the ICI axis
    flat = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(lambda a: a.sharding, sharded))[0]
    assert any("model" in str(sh.spec) for _, sh in flat), \
        "no param sharded over the ici 'model' axis"


def test_hybrid_mesh_single_slice_fallback():
    """With one slice the helper degrades to (1, n) — same call sites."""
    mesh = make_hybrid_mesh(ici_axes=("model",), ici_shape=(8,),
                            num_slices=1)
    assert mesh.devices.shape == (1, 8)


def test_trainer_runs_on_hybrid_mesh():
    """meant_trainer consumes a hybrid (dcn, model) mesh unchanged: batches
    shard over the leading dcn axis, TP-able params stay replicated (the
    trainer replicates params; shard_params is the serving/TP path)."""
    from meant_tpu.data import ArrayLoader
    from meant_tpu.models import EmbeddingConfig, meant
    from meant_tpu.train import meant_trainer

    mesh = make_hybrid_mesh(ici_axes=("model",), ici_shape=(4,),
                            num_slices=2)
    rng = np.random.RandomState(0)
    b, lag, s = 16, 2, 16
    data = {
        "tweets": rng.randint(2, 100, size=(b, lag, s)).astype(np.int32),
        "graphs": rng.randn(b, lag, 4, 32, 32).astype(np.float32),
        "attention_masks": np.ones((b, lag, s), np.float32),
        "y": rng.randint(0, 2, size=(b,)).astype(np.int32),
    }
    model = meant(text_dim=32, image_dim=32, price_dim=4, height=32,
                  width=32, patch_res=16, lag=lag, num_classes=2,
                  embedding=EmbeddingConfig(vocab_size=100, hidden_size=32,
                                            max_position_embeddings=40),
                  num_heads=4, num_encoders=1, channels=4)
    trainer = meant_trainer({
        "model": model, "model_name": "meant", "dataset": "Tempstock",
        "train_loader": ArrayLoader(data, b), "epochs": 1,
        "num_classes": 2, "lag": lag, "mesh": mesh, "test_model": False,
        "run_id": "hybrid", "lrst": "constant",
    })
    batch = next(iter(trainer.train_loader))
    trainer._init_state(batch)
    trainer._build_steps()
    db = trainer._device_batch(batch)
    assert "dcn" in str(db["tweets"].sharding.spec)
    state, loss, cm = trainer._jit_train(trainer.state, db)
    assert np.isfinite(float(loss))


def test_multislice_config_errors_raise_not_silently_flatten(monkeypatch):
    """On a (simulated) multi-slice fleet, a create_hybrid_device_mesh
    failure that is NOT an ImportError is a config error (ici_shape vs
    per-slice device count, num_slices vs topology) and must RAISE — a
    silent flat-factoring fallback could place an ici axis across slices,
    moving per-layer TP collectives onto DCN."""
    import pytest
    from jax.experimental import mesh_utils

    class FakeDev:
        def __init__(self, i):
            self.id = i
            self.slice_index = i // 4

    def boom(**kw):
        raise ValueError("ici_shape does not factor per-slice devices")

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", boom)
    with pytest.raises(ValueError, match="does not factor"):
        make_hybrid_mesh(ici_axes=("model",), ici_shape=(3,), num_slices=2,
                         devices=[FakeDev(i) for i in range(8)])


def test_multislice_importerror_falls_back_loudly(monkeypatch):
    """Only a missing mesh_utils API degrades to flat factoring, and it
    must warn: the fallback loses the slice-locality guarantee."""
    import warnings

    from jax.experimental import mesh_utils

    class FakeDev:
        def __init__(self, i):
            self.id = i
            self.slice_index = i // 4

    def gone(**kw):
        raise ImportError("no create_hybrid_device_mesh in this jax")

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", gone)
    devs = [FakeDev(i) for i in range(8)]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        try:
            make_hybrid_mesh(ici_axes=("model",), ici_shape=(4,),
                             num_slices=2, devices=devs)
        except TypeError:
            pass  # Mesh() rejects fake devices — the fallback was reached
    assert any("flat device factoring" in str(w.message) for w in rec)


def test_shard_batch_multiprocess_path_matches_device_put(monkeypatch):
    """On a multi-host pod each process holds only its rows of the global
    batch, so shard_batch assembles a global jax.Array via
    make_array_from_process_local_data instead of device_put. In this
    single-process suite the addressable portion IS the whole batch, so the
    two paths must produce identical, identically-sharded arrays — what the
    test pins is that the multi-process branch is live and semantically
    equal where the topologies coincide."""
    from meant_tpu.parallel import make_mesh
    from meant_tpu.parallel.mesh import shard_batch

    mesh = make_mesh(("data",))
    batch = {"tweets": np.arange(8 * 6, dtype=np.float32).reshape(8, 6),
             "labels": np.arange(8, dtype=np.int32)}
    put = shard_batch(batch, mesh)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assembled = shard_batch(batch, mesh)

    for k in batch:
        assert assembled[k].sharding == put[k].sharding
        np.testing.assert_array_equal(np.asarray(assembled[k]),
                                      np.asarray(put[k]))
