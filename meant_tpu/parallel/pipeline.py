"""Pipeline parallelism (GPipe-style) over a mesh axis.

The reference has no distribution beyond (broken) DataParallel (SURVEY
§2.7); DP is the parity configuration and TP/SP ship as headroom. This
module adds the PP headroom: a stack of identical layers is sharded over a
`pipe` mesh axis (leading layer axis split across stages), the batch is cut
into microbatches, and activations flow stage-to-stage over the ICI ring
via `jax.lax.ppermute` on a static GPipe schedule (m + n_stages - 1 ticks).

Fully differentiable (static trip counts -> scan; ppermute transposes), so
a jitted train step can take grads straight through the pipeline — see
tests/test_pipeline.py for forward and gradient equivalence against the
sequential stack on the 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def stack_layer_params(param_trees):
    """Stack per-layer param trees along a new leading 'layer' axis (the
    axis pipeline_apply shards over the pipe stages)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *param_trees)


def pipeline_apply(layer_fn: Callable, stacked_params, x, *, mesh: Mesh,
                   axis: str = "pipe", microbatches: int = None):
    """Run x through L stacked layers pipelined over the `axis` stages.

    layer_fn(params_i, x) -> x applies ONE layer. `stacked_params` leaves
    have a leading layer axis L divisible by the stage count; each stage
    scans its local L/n layers. x: a (B, ...) array OR a pytree of such
    arrays (e.g. (hidden, attention_mask) for the MEANT LanguageEncoder —
    layer_fn must return the same structure); B must be divisible by the
    microbatch count (default = stage count)."""
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    m = microbatches or n
    B = jax.tree.leaves(x)[0].shape[0]
    assert B % m == 0, f"batch {B} not divisible into {m} microbatches"
    micro = jax.tree.map(
        lambda a: a.reshape(m, B // m, *a.shape[1:]), x)

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)

    def body(params_local, micro_all):
        stage = jax.lax.axis_index(axis)

        def run_local(state):
            return jax.lax.scan(
                lambda s, p: (layer_fn(p, s), None), state, params_local)[0]

        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, t):
            state, outs = carry
            inject = jax.tree.map(lambda a: a[jnp.minimum(t, m - 1)],
                                  micro_all)
            put = jnp.logical_and(stage == 0, t < m)
            state = jax.tree.map(lambda i, s: jnp.where(put, i, s),
                                 inject, state)
            state = run_local(state)
            idx = jnp.clip(t - (n - 1), 0, m - 1)
            take = jnp.logical_and(stage == n - 1, t >= n - 1)
            outs = jax.tree.map(
                lambda o, s: o.at[idx].set(jnp.where(take, s, o[idx])),
                outs, state)
            state = jax.lax.ppermute(state, axis, perm)
            return (state, outs), None

        init = (jax.tree.map(lambda a: jnp.zeros_like(a[0]), micro_all),
                jax.tree.map(jnp.zeros_like, micro_all))
        # mark the carry device-varying; pcast is pvary's replacement
        if hasattr(jax.lax, "pcast"):
            init = jax.tree.map(
                lambda z: jax.lax.pcast(z, axis, to="varying"), init)
        elif hasattr(jax.lax, "pvary"):
            init = jax.tree.map(lambda z: jax.lax.pvary(z, axis), init)
        (state, outs), _ = jax.lax.scan(step, init,
                                        jnp.arange(m + n - 1))
        # only the last stage wrote outputs — psum broadcasts them
        return jax.lax.psum(
            jax.tree.map(
                lambda o: jnp.where(stage == n - 1, o, jnp.zeros_like(o)),
                outs), axis)

    fn = _shard_map(body, mesh, in_specs=(param_specs, P()),
                    out_specs=P())
    outs = fn(stacked_params, micro)
    return jax.tree.map(
        lambda o, a: o.reshape(B, *a.shape[1:]), outs, x)


def pipeline_stage_shardings(stacked_params, mesh: Mesh,
                             axis: str = "pipe"):
    """NamedShardings placing each leaf's leading layer axis over the pipe
    stages (use with jax.device_put before the jitted step)."""
    from jax.sharding import NamedSharding
    return jax.tree.map(lambda _: NamedSharding(mesh, P(axis)),
                        stacked_params)
