"""FSDP / ZeRO-3-style parameter + optimizer-state sharding over a mesh axis.

The reference never shards parameters or optimizer state — its only
distribution strategy is a latently broken single-site ``nn.DataParallel``
wrap (``pretrain_mlm.py:292-295``, SURVEY.md §2.7). On TPU the idiomatic
equivalent of torch FSDP / DeepSpeed ZeRO-3 is pure GSPMD: place every
parameter (and its Adam moments, which are param-shaped) with ONE dimension
sharded over the ``data`` axis and jit the train step. XLA then

  * all-gathers each parameter just before its use in the forward/backward
    (the FSDP "unshard on demand"),
  * reduce-scatters the gradients (because the updated state the step
    returns is declared sharded), and
  * runs the optimizer update on the local shard only (ZeRO's m/v/param
    partitioning).

No wrapper module, no hand-written collectives, no prefetch machinery —
the sharding annotation IS the strategy; scheduling/overlap belongs to the
compiler. Memory per device for state drops from ``P + 2P`` (AdamW) to
``(P + 2P)/n_data`` plus transient all-gather buffers.

Composes with megatron TP (``sharding_rules.py``): apply the TP rules
first, then FSDP-shard the still-replicated leaves over ``data`` — the two
touch different axes of the mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: sharding a 768-float bias saves
# ~3 KB but costs an all-gather dispatch; the win is the big 2-D kernels.
DEFAULT_MIN_SIZE = 2 ** 15


def fsdp_spec(shape, axis_size: int, axis: str = "data",
              min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec sharding the LARGEST evenly-divisible dim over `axis`.

    Largest-dim sharding minimizes the number of cuts through the matmul
    lane/sublane tiling and keeps per-shard blocks big; leaves with no
    divisible dim (or too small to matter) replicate — correctness and
    compiler-friendliness over maximal partitioning.
    """
    if axis_size <= 1 or not shape:
        return P()
    size = 1
    for s in shape:
        size *= s
    if size < min_size:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: shape[d], reverse=True)
    for d in dims:
        if shape[d] % axis_size == 0:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, axis: Optional[str] = None,
                   min_size: int = DEFAULT_MIN_SIZE):
    """Per-leaf NamedSharding pytree for params / optimizer state / a whole
    TrainState (any pytree of arrays — scalars and small leaves replicate).

    Leaves that already carry a non-replicated sharding (e.g. megatron-TP
    kernels placed by `shard_params`) keep it untouched.
    """
    if axis is None:
        axis = mesh.axis_names[0]
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)

    def spec_for(leaf):
        existing = getattr(leaf, "sharding", None)
        if isinstance(existing, NamedSharding) and \
                any(s is not None for s in existing.spec):
            return existing
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, fsdp_spec(shape, axis_size, axis,
                                             min_size))

    return jax.tree.map(spec_for, tree)


def fsdp_shard(tree, mesh: Mesh, axis: Optional[str] = None,
               min_size: int = DEFAULT_MIN_SIZE):
    """Place `tree` with FSDP shardings; returns (sharded_tree, shardings)."""
    shardings = fsdp_shardings(tree, mesh, axis, min_size)
    return jax.tree.map(jax.device_put, tree, shardings), shardings
