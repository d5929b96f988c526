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


def make_hybrid_mesh(ici_axes: Sequence[str] = ("model",),
                     ici_shape: Optional[Sequence[int]] = None,
                     dcn_axis: str = "dcn",
                     num_slices: Optional[int] = None,
                     devices=None) -> Mesh:
    """Multi-slice mesh: the leading `dcn_axis` spans TPU slices (traffic
    over the data-center network) and the trailing `ici_axes` live INSIDE a
    slice (traffic over the ICI torus). Lay shardings out so the
    bandwidth-hungry collectives ride ICI: batch/gradient allreduce over
    `dcn_axis` (one reduce per step, latency-tolerant), tensor/sequence
    sharding over `ici_axes` (per-layer collectives, bandwidth-bound).

    On real multi-slice fleets jax exposes slice topology via
    `jax.devices()[i].slice_index`; devices are grouped so each dcn row is
    one slice (`mesh_utils.create_hybrid_device_mesh` ordering). In
    single-slice or CPU environments (this sandbox) the same axis layout is
    emulated by factoring the flat device list — semantics (axis order,
    collective placement) are identical, which is what the CPU-mesh tests
    validate; only the physical link speeds differ."""
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if num_slices is None:
        num_slices = len(slice_ids) if len(slice_ids) > 1 else 1
    if len(slice_ids) > 1:
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=tuple(ici_shape or
                                 [len(devices) // num_slices]
                                 + [1] * (len(ici_axes) - 1)),
                dcn_mesh_shape=(num_slices,) + (1,) * len(ici_axes),
                devices=devices)
            # create_hybrid_device_mesh returns (dcn*ici_0, ici_1, ...);
            # reshape so the slice axis leads
            arr = arr.reshape((num_slices,)
                              + tuple(ici_shape or
                                      [len(devices) // num_slices]
                                      + [1] * (len(ici_axes) - 1)))
            return Mesh(arr, (dcn_axis, *ici_axes))
        except ImportError as e:
            # old jax without mesh_utils: fall back to flat factoring, but
            # LOUDLY — on a real multi-slice fleet the flat reshape can put
            # an ici axis across slices, silently moving per-layer TP
            # collectives onto DCN (the exact regression this function
            # exists to prevent).
            import warnings
            warnings.warn(
                f"create_hybrid_device_mesh unavailable ({e}); falling back "
                f"to flat device factoring — ici axes are NOT guaranteed to "
                f"stay inside a slice", RuntimeWarning)
        # any other failure (ici_shape vs per-slice device count mismatch,
        # num_slices disagreeing with detected slice topology) is a config
        # error: raise, don't silently mis-lay the mesh.
    per_slice = len(devices) // max(num_slices, 1)
    shape = [num_slices] + list(
        ici_shape or [per_slice] + [1] * (len(ici_axes) - 1))
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, (dcn_axis, *ici_axes))


def batch_sharding(mesh: Mesh, batch_axis: Optional[str] = None
                   ) -> NamedSharding:
    """Shard the leading (batch) dim over `batch_axis` — default the mesh's
    LEADING axis ('data' on the standard mesh, 'dcn' on a hybrid one), so
    trainers work unchanged on either layout."""
    if batch_axis is None:
        batch_axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, batch_axis: Optional[str] = None):
    """Place every array in the (pytree) batch with its leading dim sharded.

    Single-process (one host, all devices addressable): a plain device_put
    scatters the host array across the mesh. Multi-process (a real pod:
    one process per host, each loader yielding only ITS rows of the global
    batch): device_put with a global sharding is invalid — the per-host
    arrays are assembled into one global jax.Array via
    `jax.make_array_from_process_local_data`, which maps each process's
    local rows onto its addressable devices (the standard multi-host input
    recipe; every process must call it with the same global sharding).
    Either way the jitted train step sees one identically-sharded global
    batch, so trainers are agnostic to the launch topology."""
    sharding = batch_sharding(mesh, batch_axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate every leaf across the mesh. Multi-process: every host holds
    the full array (replication's local portion IS the global value), so the
    same make_array_from_process_local_data recipe as shard_batch applies."""
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
