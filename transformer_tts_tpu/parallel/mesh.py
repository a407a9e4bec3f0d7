"""Mesh construction and sharding helpers.

TPU-native replacement for the reference's distributed runtime
(train_fastspeech2.py:352-374: mp.spawn + NCCL process groups + DDP +
SyncBatchNorm + DistributedSamplerWrapper):

* A 1-D ``data`` mesh over all local/ICI-connected devices; ``pjit`` of the
  train step makes the gradient all-reduce an XLA ICI collective — there is
  no hand-written communication layer.
* BatchNorm statistics are global automatically: under pjit the module
  computes over the *logical* (global) batch, so XLA inserts the cross-
  replica reductions SyncBatchNorm does by hand.
* Host data sharding: each process feeds its ``jax.process_index()`` slice
  of every global batch (same contract as the DistributedSamplerWrapper:
  disjoint batches per rank, datasets_fastspeech2.py:847-890).

An optional ``model`` axis is accepted for future tensor parallelism; the
reference has no TP/PP (SURVEY.md §2.7) and the models are ~30-60M params,
so data-parallel is the parity configuration.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Create a ('data', 'model') mesh; defaults to all devices on data."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis — over
    ('dcn', 'data') jointly on a multi-slice mesh."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def make_multislice_mesh(n_slices: int, devices=None,
                         model: int = 1) -> Mesh:
    """('dcn', 'data', 'model') mesh for multi-slice data parallelism.

    The leading axis spans slices (DCN-connected); the inner axes stay
    within one slice (ICI). Axis ORDER is the whole design: with dcn
    outermost and batches sharded over ('dcn', 'data')
    (``batch_sharding``), GSPMD decomposes the gradient all-reduce
    hierarchically — a large intra-slice reduce over ICI first, then a
    1/ici_size-sized cross-slice all-reduce over DCN — so the slow
    inter-slice network only ever carries the already-reduced tensor.
    Tensor-parallel collectives (the 'model' axis, parallel/tp.py) stay
    strictly intra-slice.

    ``devices`` must be ordered slice-major (jax.devices() is, on real
    multi-slice TPU; the CPU dryrun partitions the virtual devices).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % (n_slices * model) != 0:
        raise ValueError(
            f"{n} devices not divisible by {n_slices} slices x "
            f"model={model}")
    data = n // (n_slices * model)
    dev_array = np.asarray(devices).reshape(n_slices, data, model)
    return Mesh(dev_array, axis_names=("dcn", "data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)


def make_global_batch(batch, mesh: Mesh):
    """Form the global per-step batch from this process's local arrays.

    Single-process: plain ``shard_batch``. Multi-process (after
    ``jax.distributed.initialize``): each process contributes its LOCAL
    rows and the result is a global jax.Array sharded over the mesh's
    devices — the SPMD equivalent of the DistributedSamplerWrapper
    contract (each DDP rank feeds a disjoint slice of the global step,
    datasets_fastspeech2.py:847-919). Requires every process to supply
    identically-shaped local arrays (DataLoader ``fixed_shapes`` mode).
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.tree.map(put, batch)


def replicate_global(tree, mesh: Mesh):
    """Replicate host values onto every device of a (possibly
    multi-process) mesh. Single-process: device_put; multi-process: each
    process supplies the identical full value (same init seed contract)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated(mesh))
    sharding = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape)
    return jax.tree.map(put, tree)
