"""Sinusoidal positional encodings.

Two variants, matching the reference tables exactly:

* ``sinusoid_table``: the quirky absolute-PE table of
  ``Models/modules.py:90-111`` — column j gets angle ``pos/10000^(2j/d)``
  (twice the standard exponent), sin for even j, cos for odd j. Added to the
  input scaled by a *learnable* scalar ``alpha``.
* ``relative_sinusoid_table``: the standard table of
  ``Models/modules.py:285-306`` used by the Conformer's Transformer-XL
  relative attention.

The reference builds the first table with a 5000x(d/2) Python double loop at
module init; here both are closed-form jnp expressions (trace-time
constants under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

MAX_ABS_POSITIONS = 5000   # Models/modules.py:92
MAX_REL_POSITIONS = 3000   # Models/modules.py:286


def sinusoid_table(max_len: int, d_model: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    """(max_len, d_model) table with the reference's doubled exponent.

    pe[p, j] = sin(p / 10000**(2j/d))  (j even)
             = cos(p / 10000**(2j/d))  (j odd)
    """
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    j = jnp.arange(d_model, dtype=jnp.float32)[None, :]
    angle = pos / jnp.power(10000.0, 2.0 * j / d_model)
    pe = jnp.where(j % 2 == 0, jnp.sin(angle), jnp.cos(angle))
    return pe.astype(dtype)


def relative_sinusoid_table(max_len: int, d_model: int,
                            dtype=jnp.float32) -> jnp.ndarray:
    """Standard sinusoid table (sin even / cos odd, shared frequency)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    half = jnp.arange(0, d_model, 2, dtype=jnp.float32)[None, :]
    freq = jnp.exp(half * -(jnp.log(10000.0) / d_model))
    angles = pos * freq
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe.astype(dtype)


class PositionalEncoder(nn.Module):
    """x + alpha * PE with learnable scalar alpha (Models/modules.py:90-111).

    ``offset`` supports incremental AR decoding: at decode step t the single
    query row gets PE row t.
    """
    d_model: int
    dropout: float = 0.1
    max_len: int = MAX_ABS_POSITIONS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True, offset=0):
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        table = sinusoid_table(self.max_len, self.d_model, self.dtype)
        seq_len = x.shape[1]
        if isinstance(offset, int) and offset == 0:
            pe = table[:seq_len]
        else:
            pe = jax.lax.dynamic_slice_in_dim(table, offset, seq_len, axis=0)
        x = x + alpha.astype(self.dtype) * pe[None]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class RelativePositionalEncoder(nn.Module):
    """Returns (dropout(x*xscale), dropout(pe)) — Models/modules.py:285-306."""
    d_model: int
    dropout: float = 0.1
    xscale: float = 1.0
    max_len: int = MAX_REL_POSITIONS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        table = relative_sinusoid_table(self.max_len, self.d_model, self.dtype)
        seq_len = x.shape[1]
        pe = table[None, :seq_len]
        drop = nn.Dropout(self.dropout, deterministic=not train)
        return drop(x * self.xscale), drop(pe)
