"""Vectorized length regulation (duration-driven frame expansion).

The reference expands phone vectors with a per-utterance Python loop of
``Tensor.expand`` + ``cat`` (Models/varianceadaptor.py:131-184) — the single
most TPU-hostile construct in the codebase (dynamic shapes, host loop).

TPU-native replacement (static shapes, one gather, SURVEY.md §7):

    ends   = cumsum(durations)                      # (B, L)
    phone  = searchsorted(ends, t, side='right')    # frame t -> phone index
    out[t] = x[phone[t]]                            # take_along_axis
    mel_len = ends[:, -1]; frames >= mel_len are masked to 0.

Matches reference semantics exactly for valid frames: phone ``i`` covers
frames [ends[i-1], ends[i]).  Padding positions (duration 0) are naturally
skipped because their half-open interval is empty.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def length_regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand phone features by integer durations.

    Args:
      x: (B, L, D) phone-level features.
      durations: (B, L) non-negative integer frame counts (padding rows 0).
      max_frames: static output length T (bucket size). Frames beyond the
        total duration are zero-filled (reference pads with 0.0:
        Models/varianceadaptor.py:233-249).

    Returns:
      (out, mel_len, mel_pos):
        out: (B, T, D) frame-level features, zero beyond mel_len.
        mel_len: (B,) int32 total frames (clipped to T).
        mel_pos: (B, T) 1-based positions, 0 beyond mel_len (matches the
          ``pos_mel`` contract used for pad masks).
    """
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=1)                     # (B, L)
    mel_len = jnp.minimum(ends[:, -1], max_frames)           # (B,)

    t = jnp.arange(max_frames, dtype=jnp.int32)              # (T,)
    # frame t belongs to the first phone whose end > t
    phone_idx = jax.vmap(
        lambda e: jnp.searchsorted(e, t, side="right")
    )(ends)                                                  # (B, T)
    phone_idx = jnp.minimum(phone_idx, x.shape[1] - 1)

    out = jnp.take_along_axis(x, phone_idx[:, :, None], axis=1)

    valid = t[None, :] < mel_len[:, None]                    # (B, T)
    out = jnp.where(valid[:, :, None], out, 0.0)
    mel_pos = jnp.where(valid, t[None, :] + 1, 0)
    return out, mel_len, mel_pos


def durations_from_log(
    log_duration: jnp.ndarray,
    log_offset: float = 1.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Inference-time duration rounding.

    Reference: ``clamp(round(exp(logd) - log_offset), min=0)`` with an
    optional ±20% perturbation factor applied before re-rounding
    (Models/varianceadaptor.py:75-81).
    """
    d = jnp.clip(jnp.round(jnp.exp(log_duration) - log_offset), 0, None)
    if scale != 1.0:
        d = jnp.round(d * scale)
    return d.astype(jnp.int32)
