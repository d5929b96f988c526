"""GPipe-style pipeline parallelism over the 8-device CPU mesh: forward and
gradients must match the sequential layer stack."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-device shard_map pipeline

import jax
import jax.numpy as jnp

from meant_tpu.parallel import make_mesh
from meant_tpu.parallel.pipeline import (pipeline_apply,
                                         pipeline_stage_shardings,
                                         stack_layer_params)


def _mlp_layer(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


def _make_stack(n_layers=8, d=16, seed=0):
    rng = np.random.RandomState(seed)
    trees = [{
        "w1": jnp.asarray(rng.randn(d, 2 * d).astype(np.float32) * 0.1),
        "b1": jnp.asarray(rng.randn(2 * d).astype(np.float32) * 0.1),
        "w2": jnp.asarray(rng.randn(2 * d, d).astype(np.float32) * 0.1),
    } for _ in range(n_layers)]
    return stack_layer_params(trees), trees


def _sequential(trees, x):
    for p in trees:
        x = _mlp_layer(p, x)
    return x


def test_pipeline_matches_sequential():
    mesh = make_mesh(axes=("pipe",))
    stacked, trees = _make_stack()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    out = pipeline_apply(_mlp_layer, stacked, x, mesh=mesh, axis="pipe")
    ref = _sequential(trees, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_more_microbatches():
    mesh = make_mesh(axes=("pipe",))
    stacked, trees = _make_stack(n_layers=16, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(48, 16).astype(np.float32))
    out = pipeline_apply(_mlp_layer, stacked, x, mesh=mesh, axis="pipe",
                         microbatches=16)
    ref = _sequential(trees, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_grads_match_sequential():
    mesh = make_mesh(axes=("pipe",))
    stacked, trees = _make_stack(seed=4)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(16, 16).astype(np.float32))

    def loss_pipe(p):
        return jnp.sum(pipeline_apply(_mlp_layer, p, x, mesh=mesh,
                                      axis="pipe") ** 2)

    def loss_seq(p):
        y = x
        for i in range(p["w1"].shape[0]):
            y = _mlp_layer(jax.tree.map(lambda t: t[i], p), y)
        return jnp.sum(y ** 2)

    gp = jax.grad(loss_pipe)(stacked)
    gs = jax.grad(loss_seq)(stacked)
    for k in gp:
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gs[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def _make_lang_stack(n_layers=8, d=64, heads=4, seed=0):
    """A stack of REAL MEANT LanguageEncoders (xPos attention + mask) at
    reduced dims — the layer the pipeline would actually run (VERDICT r2
    #4: PP validated through the model, not tanh toys)."""
    from meant_tpu.nn.encoders import LanguageEncoder
    enc = LanguageEncoder(d, heads, ff_dropout=0.0, rot_dim=d // heads // 2)
    x0 = jnp.zeros((2, 8, d), jnp.float32)
    m0 = jnp.ones((2, 8), jnp.float32)
    key = jax.random.PRNGKey(seed)
    trees = [enc.init(jax.random.fold_in(key, i), x0, m0)["params"]
             for i in range(n_layers)]
    return enc, stack_layer_params(trees), trees


def _lang_layer(enc):
    def layer(p, state):
        h, mask = state
        return enc.apply({"params": p}, h, mask), mask
    return layer


def test_pipeline_language_encoder_matches_sequential():
    mesh = make_mesh(axes=("pipe",))
    enc, stacked, trees = _make_lang_stack()
    rng = np.random.RandomState(8)
    h = jnp.asarray(rng.randn(16, 8, 64).astype(np.float32))
    mask = jnp.asarray((rng.rand(16, 8) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)   # no fully-masked rows
    out, _ = pipeline_apply(_lang_layer(enc), stacked, (h, mask),
                            mesh=mesh, axis="pipe")
    ref = h
    for p in trees:
        ref = enc.apply({"params": p}, ref, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pipeline_language_encoder_grads_match_sequential():
    mesh = make_mesh(axes=("pipe",))
    enc, stacked, trees = _make_lang_stack(seed=9)
    rng = np.random.RandomState(10)
    h = jnp.asarray(rng.randn(8, 8, 64).astype(np.float32))
    mask = jnp.ones((8, 8), jnp.float32)

    def loss_pipe(p):
        out, _ = pipeline_apply(_lang_layer(enc), p, (h, mask),
                                mesh=mesh, axis="pipe")
        return jnp.mean(out ** 2)

    def loss_seq(p):
        y = h
        for i in range(8):
            y = enc.apply(
                {"params": jax.tree.map(lambda t: t[i], p)}, y, mask)
        return jnp.mean(y ** 2)

    gp = jax.grad(loss_pipe)(stacked)
    gs = jax.grad(loss_seq)(stacked)
    leaves_p, _ = jax.tree.flatten_with_path(gp)
    leaves_s = jax.tree.leaves(gs)
    for (path, a), b in zip(leaves_p, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_pipeline_sharded_params_under_jit():
    mesh = make_mesh(axes=("pipe",))
    stacked, trees = _make_stack(seed=6)
    sharded = jax.tree.map(jax.device_put, stacked,
                           pipeline_stage_shardings(stacked, mesh))
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    out = jax.jit(lambda p, x_: pipeline_apply(
        _mlp_layer, p, x_, mesh=mesh, axis="pipe"))(sharded, x)
    ref = _sequential(trees, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
