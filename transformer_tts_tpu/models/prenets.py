"""Prenets.

* ``DecoderPreNet`` (Models/prenets.py:8-44): 2-layer MLP in->256->d with
  ReLU + dropout(0.5). Per Tacotron convention the dropout stays active at
  synthesis; the reference's test CLIs instead construct the model with
  dropout 0.0 (test.py:103) — we expose ``train`` and let callers pick.
* The reference's ``EncoderPreNet`` (prenets.py:46-73) references an
  undefined ``self.final_out`` and is never instantiated — a known
  reference bug (SURVEY.md §7); we provide a *working* version for
  completeness.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class DecoderPreNet(nn.Module):
    input_size: int
    output_size: int
    hidden_size: int = 256
    dropout: float = 0.5
    output_type: bool = False   # discrete-token mode uses an Embedding fc1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.output_type:
            h = nn.Embed(self.input_size, self.hidden_size,
                         dtype=self.dtype, name="fc1")(x)
        else:
            h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        h = drop(nn.relu(h))
        h = nn.Dense(self.output_size, dtype=self.dtype, name="fc2")(h)
        return drop(nn.relu(h))


class EncoderPreNet(nn.Module):
    """embed -> 3x(1x1 conv + BN + ReLU + dropout) -> Dense (fixed)."""
    vocab_size: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        h = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="embed")(x)
        for i in range(3):
            h = nn.Conv(self.d_model, (1,), dtype=self.dtype,
                        name=f"conv_{i + 1}")(h)
            h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"batch_norm_{i + 1}")(h)
            h = drop(nn.relu(h))
        return nn.Dense(self.d_model, dtype=self.dtype, name="final_out")(h)
