"""Tensor-parallel parameter sharding over the ``model`` mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.7) — its models are
30-60M params — so data parallelism is the parity configuration. This
module turns the reserved ``model`` axis into *working* TP for scaling
beyond parity: parameter matrices are sharded over their output dimension
and XLA's GSPMD propagation derives the activation shardings and inserts
the collectives. No model code changes: shardings are applied to the
parameter pytree with ``jax.device_put`` and flow from there.

Rules (conservative, correct by propagation):
* Dense/Conv kernels whose LAST dim is divisible by the model-axis size
  are sharded on that dim: P(None, ..., 'model'). GSPMD then computes
  y = x @ W as column-parallel, and the next layer's row contraction
  reduces over the axis automatically.
* 1-D biases matching a sharded kernel's output dim are sharded the same
  way; everything else (LayerNorm scales, embeddings, small heads) is
  replicated.
* Optimizer state is sharded with the same rule (Adam moments mirror the
  param shapes), so update math stays local.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, model_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] % model_size == 0 and model_size > 1:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    if len(shape) == 1 and shape[0] % model_size == 0 and model_size > 1 \
            and shape[0] >= 256:
        # large biases matching sharded kernel outputs
        return P("model")
    return P()


def param_shardings(params: Any, mesh: Mesh):
    """Per-leaf NamedShardings for a parameter (or optimizer-state) tree."""
    model_size = mesh.shape.get("model", 1)

    def to_sharding(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, model_size))
    return jax.tree.map(to_sharding, params)


def shard_state_tp(state, mesh: Mesh):
    """device_put a TrainState with TP-sharded params/opt_state and
    replicated scalars/batch stats."""
    rep = NamedSharding(mesh, P())
    p_sh = param_shardings(state.params, mesh)
    o_sh = jax.tree.map(
        lambda leaf: NamedSharding(
            mesh, _leaf_spec(leaf, mesh.shape.get("model", 1)))
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) > 0
        else rep,
        state.opt_state)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, p_sh),
        opt_state=jax.device_put(state.opt_state, o_sh),
        batch_stats=jax.device_put(state.batch_stats, rep),
        vq_stats=jax.device_put(state.vq_stats, rep),
    )
