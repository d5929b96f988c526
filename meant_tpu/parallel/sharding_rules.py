"""Parameter sharding rules for 2-D (data, model) meshes.

The reference never shards parameters (SURVEY.md §2.7 — DP only, and even
that is latently broken). The TPU framework keeps a 1-D data mesh as the
parity configuration and offers megatron-style tensor parallelism as mesh
headroom: column-parallel for up-projections (q/k/v/qkv/ff_in — output dim
sharded), row-parallel for down-projections (multi_mad/ff_out/proj_out —
input dim sharded), embeddings sharded on the vocab axis. XLA inserts the
matching all-reduces when the jitted step consumes these shardings — no
hand-written collectives.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec for the kernel) — biases/norms replicate.
DEFAULT_TP_RULES: Sequence[Tuple[str, P]] = (
    # column-parallel: shard the OUTPUT features (TimeSformer's fused
    # to_qkv included — heads stay whole per shard when heads % tp == 0)
    (r"\b(q|k|v|qkv|to_qkv|ff_in|proj_in|intermediate)\b.*kernel",
     P(None, "model")),
    # row-parallel: shard the INPUT features
    (r"\b(multi_mad|ff_out|proj_out|to_out|output)\b.*kernel",
     P("model", None)),
    # embeddings: vocab axis
    (r"word_embeddings", P("model", None)),
)


def param_shardings(params, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """NamedSharding pytree for `params`: first matching rule wins, otherwise
    replicated. Specs whose sharded dim doesn't divide evenly fall back to
    replicated (correctness over partitioning)."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def spec_for(path: str, leaf) -> NamedSharding:
        if axis_size > 1:
            for pattern, spec in rules:
                if re.search(pattern, path):
                    # scanned towers (nn/stack.py) stack every leaf with a
                    # LEADING layer axis — shift the rule right by one dim so
                    # 'model' stays on the same logical (in/out) axis and the
                    # layer axis stays replicated
                    shifted = (P(None, *spec) if "_scan" in path
                               and leaf.ndim == len(spec) + 1 else spec)
                    # check divisibility of the sharded dimension
                    ok = True
                    for dim, name in enumerate(shifted):
                        if name == "model" and dim < leaf.ndim and \
                                leaf.shape[dim] % axis_size != 0:
                            ok = False
                    if ok and leaf.ndim >= len([s for s in shifted
                                                if s is not None]):
                        padded = P(*(list(shifted) + [None] *
                                     (leaf.ndim - len(shifted))))
                        return NamedSharding(mesh, padded)
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {path: spec_for(jax.tree_util.keystr(path), leaf)
             for path, leaf in flat}

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: specs[path], params)


def shard_params(params, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)
