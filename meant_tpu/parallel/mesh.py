"""Device mesh + sharding rules.

The reference's only distribution strategy is a (latently broken) single-site
nn.DataParallel wrap (`pretrain_mlm.py:292-295,329-330` — SURVEY.md §2.7).
The TPU-native replacement: one jax.sharding.Mesh over the slice, batch axis
sharded along 'data', params replicated. Gradients reduce over ICI via the
psum XLA inserts when the jitted train step consumes data-sharded batches and
produces replicated parameter updates — no hand-written collectives.

The mesh is 1-D ('data') for parity workloads but constructed through a
general helper so tensor/pipeline axes can be added without touching call
sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Mesh over all (or given) devices. Default: 1-D data-parallel mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_axis: str = "data"):
    """Place every array in the (pytree) batch with its leading dim sharded."""
    sharding = batch_sharding(mesh, batch_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
