"""GPipe-style pipeline parallelism over the 8-device CPU mesh: forward and
gradients must match the sequential layer stack."""

import numpy as np

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
