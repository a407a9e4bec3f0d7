"""Attention / padding mask construction.

Reference semantics (``train_fastspeech2.py:42-82``, ``train.py:26-58``):

* ``src_mask = (pos != 0)[:, None, :]`` — shape (B, 1, T), True = attend.
* AR decoder additionally ANDs a lower-triangular "no-peek" mask.
* ``fix_mask`` (band-diagonal context window) restricts attention to a
  ±(w-1)/2 diagonal band (``Models/fastspeech2.py:124-135``).

All masks here are boolean, True = attend; the attention op converts False
into a -1e4 logit fill (``Models/modules.py:14`` — AMP/bf16-safe).

The reference builds band masks with a Python loop over ``np.eye`` offsets;
here everything is a broadcasted iota comparison, fused by XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def pad_mask(pos: jnp.ndarray, pad: int = 0) -> jnp.ndarray:
    """(B, T) positions (1-based; 0 = padding) -> (B, 1, T) bool mask."""
    return (pos != pad)[:, None, :]


def no_peek_mask(size: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(1, T, T) lower-triangular causal mask (train_fastspeech2.py:42-52)."""
    r = jnp.arange(size)
    return (r[:, None] >= r[None, :])[None].astype(dtype)


def band_mask(size: int, context_len: int) -> jnp.ndarray:
    """(1, T, T) band-diagonal mask, width ``context_len`` centred on the
    diagonal (reference ``fix_mask``: Models/fastspeech2.py:124-135)."""
    r = jnp.arange(size)
    half = (context_len - 1) // 2
    diff = r[:, None] - r[None, :]
    return ((diff >= -half) & (diff <= half))[None]


def mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool, True for valid frames.

    NOTE: the reference ``get_mask_from_lengths`` uses ``ids <= lengths``
    (Models/varianceadaptor.py:251-259) which marks ``length+1`` frames
    valid — an off-by-one bug SURVEY.md flags as not-to-replicate. We use
    the correct strict ``<``.
    """
    ids = jnp.arange(max_len)[None, :]
    return ids < lengths[:, None]


def create_masks(
    pos_text: jnp.ndarray,
    pos_mel: Optional[jnp.ndarray],
    model: str = "fastspeech2",
    fix_mask: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Build (src_mask, trg_mask) as in train_fastspeech2.py:55-82.

    * FastSpeech2: trg_mask is a pure pad mask (B, 1, T_mel).
    * AR transformer: trg_mask = pad AND no-peek, (B, T_mel, T_mel).
    * ``fix_mask`` ANDs a band-diagonal window into src_mask.
    """
    src_mask = pad_mask(pos_text)
    if fix_mask is not None:
        src_mask = src_mask & band_mask(pos_text.shape[1], fix_mask)

    if pos_mel is None:
        return src_mask, None

    trg_pad = pad_mask(pos_mel)
    if model.lower() in ("fastspeech2", "lightspeech"):
        return src_mask, trg_pad
    causal = no_peek_mask(pos_mel.shape[1])
    return src_mask, trg_pad & causal
