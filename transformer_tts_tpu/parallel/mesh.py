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
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)
