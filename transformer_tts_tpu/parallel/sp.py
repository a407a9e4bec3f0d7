"""Sequence parallelism: attention sharded over a mesh axis.

Beyond reference parity (the reference caps sequences at its PE tables,
SURVEY.md §2.7, and has no sequence sharding of any kind). This is the
extension point DESIGN.md §3 promises: the flash kernel computes
attention from (q block, k block) tiles with per-batch key lengths, so
sharding the QUERY dimension over a mesh axis and all-gathering K/V is
exactly one ``shard_map`` away.

Layout: activations (B, H, T, d) arrive sequence-sharded — each device
holds T/n_seq query rows AND T/n_seq key/value rows. Inside the shard:
``all_gather`` K and V over the axis (tiled, so they reassemble in
sequence order along T), then run the local flash kernel with the full
key range. Memory per device: O(T/n) activations + O(T) gathered K/V
(K/V are d-dim vectors, 96 floats/frame — tiny next to the O(T^2/n)
score tiles flash never materializes anyway).

Non-causal only: TTS's long-sequence attention is the NAR FastSpeech2
encoder/decoder stacks (full attention over mel frames); the AR decoder
is incremental with a KV cache and never runs long-T causal attention.
A causal variant needs global query offsets inside the kernel — wire
that up when something needs it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:                                   # jax >= 0.4.35 top-level export
    from jax import shard_map
    # replication checking kwarg was renamed check_rep -> check_vma when
    # shard_map was promoted out of jax.experimental
    _NO_REP_CHECK = {"check_vma": False}
except ImportError:                    # older jax: experimental home
    from jax.experimental.shard_map import shard_map
    _NO_REP_CHECK = {"check_rep": False}


def sequence_parallel_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_len: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    *,
    sm_scale: Optional[float] = None,
    causal: bool = False,
    interpret: bool = False,
):
    """softmax(QK^T/sqrt(d))V with the sequence dim sharded over ``axis``.

    Args:
      q, k, v: (B, H, T, d) logically global arrays; T must divide by the
        axis size. Shard over T with
        ``NamedSharding(mesh, P(None, None, axis, None))`` (or pass
        replicated arrays — GSPMD resharding handles either).
      k_len: (B,) valid key lengths (replicated).
      mesh: the device mesh; ``axis`` is the sequence axis name.
    Returns (B, H, T, d), sequence-sharded like q.
    """
    from transformer_tts_tpu.ops.flash_attention import flash_attention

    if causal:
        # Causality needs each shard's GLOBAL query offset inside the
        # kernel (local row i is global row rank*T/n + i). Not wired up:
        # TTS's long-T attention is the non-causal NAR stacks, and the
        # AR decoder is incremental (never long-T causal). Refuse loudly
        # rather than silently attend to the future.
        raise NotImplementedError(
            "sequence_parallel_attention is non-causal only; the causal "
            "variant needs per-shard global query offsets in the flash "
            "kernel (see module docstring)")

    seq_spec = P(None, None, axis, None)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P()),
        out_specs=seq_spec,
        **_NO_REP_CHECK,
    )
    def inner(q_s, k_s, v_s, kl):
        # K/V reassemble in sequence order (tiled all-gather over ICI);
        # queries stay local — each device computes its T/n rows
        k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
        return flash_attention(q_s, k_full, v_full, kl,
                               sm_scale=sm_scale, interpret=interpret)

    return inner(q, k, v, k_len)
