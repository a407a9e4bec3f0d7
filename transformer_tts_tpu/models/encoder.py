"""Encoder stacks (shared by text encoding and FastSpeech2's "decoder").

Reference: ``Models/encoder.py:31-160``.

* ``Encoder``: Embedding(padding_idx=0) or Dense input -> alpha-PE -> N x
  EncoderLayer -> LayerNorm. Optional accent embedding added AFTER the
  stack (encoder.py:106-108), optional per-layer 80-dim intermediate taps.
* ``ConformerEncoder``: Embedding/Dense -> relative PE -> N x
  ConformerEncoderLayer -> LayerNorm.

TPU delta: attention maps are collected into a (B, N, H, T, T) tensor only
when ``collect_attn=True``; the reference allocates it every forward
(encoder.py:96-105).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.models.layers import (
    EncoderLayer, ConformerEncoderLayer)
from transformer_tts_tpu.ops.positional import (
    PositionalEncoder, RelativePositionalEncoder)


def _embed_or_project(embedding: bool, vocab_size: int, d_model: int,
                      dtype, name: str = "embed"):
    """Embedding with padding row forced to zero, or a Dense projection.

    torch's ``padding_idx=0`` (encoder.py:55) keeps row 0 at zero; we
    reproduce by zeroing the gradient target row via masking at call time
    instead of constraining the parameter — simpler under jit: we zero the
    looked-up vectors where the id is 0.
    """
    if embedding:
        embed = nn.Embed(vocab_size, d_model, dtype=dtype, name=name)

        def apply(x):
            out = embed(x)
            return jnp.where((x != 0)[..., None], out, 0.0)
        return apply
    dense = nn.Dense(d_model, dtype=dtype, name=name)
    return dense


class Encoder(nn.Module):
    """Transformer encoder stack (Models/encoder.py:31-112)."""
    vocab_size: int          # input vocab (embedding) or input dim (Dense)
    d_model: int
    n_layers: int
    heads: int
    ff_kernel_size: int
    concat_after: bool = False
    dropout: float = 0.1
    spk_emb_dim: Optional[int] = None
    embedding: bool = True
    accent_emb: bool = False
    n_accents: int = 5       # encoder.py:61
    intermediate_layers_out: Optional[tuple] = None
    intermediate_dim: int = 80
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, spk_emb=None, accent=None, *,
                 train: bool = True, collect_attn: bool = False):
        x = _embed_or_project(self.embedding, self.vocab_size, self.d_model,
                              self.dtype)(src)
        x = PositionalEncoder(self.d_model, self.dropout, dtype=self.dtype,
                              name="pe")(x, train=train)
        attns = []
        intermediate_outs = []
        for i in range(self.n_layers):
            x, attn = EncoderLayer(
                d_model=self.d_model, heads=self.heads,
                ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
                concat_after=self.concat_after, spk_emb_dim=self.spk_emb_dim,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, mask, spk_emb, train=train, collect_attn=collect_attn)
            if collect_attn:
                attns.append(attn)
            if self.intermediate_layers_out and i in self.intermediate_layers_out:
                tap = nn.Dense(self.intermediate_dim, dtype=self.dtype,
                               name=f"intermediate_{i}")(x)
                intermediate_outs.append(tap)
        if self.accent_emb and accent is not None:
            x = x + nn.Embed(self.n_accents, self.d_model, dtype=self.dtype,
                             name="acc_embed")(accent)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        attn_out = jnp.stack(attns, axis=1) if collect_attn else None
        if self.intermediate_layers_out:
            return x, attn_out, intermediate_outs
        return x, attn_out


class ConformerEncoder(nn.Module):
    """Conformer encoder stack (Models/encoder.py:115-160)."""
    vocab_size: int
    d_model: int
    n_layers: int
    heads: int
    ff_kernel_size: int
    dropout: float = 0.1
    spk_emb_dim: Optional[int] = None
    embedding: bool = True
    accent_emb: bool = False
    n_accents: int = 13      # encoder.py:138
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, spk_emb=None, accent=None, *,
                 train: bool = True, collect_attn: bool = False):
        x = _embed_or_project(self.embedding, self.vocab_size, self.d_model,
                              self.dtype)(src)
        if self.accent_emb and accent is not None:
            x = x + nn.Embed(self.n_accents, self.d_model, dtype=self.dtype,
                             name="acc_embed")(accent)
        x, pos_emb = RelativePositionalEncoder(
            self.d_model, self.dropout, dtype=self.dtype, name="pe",
        )(x, train=train)
        attns = []
        for i in range(self.n_layers):
            x, attn = ConformerEncoderLayer(
                d_model=self.d_model, heads=self.heads,
                ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
                spk_emb_dim=self.spk_emb_dim, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, pos_emb, mask, spk_emb, train=train,
              collect_attn=collect_attn)
            if collect_attn:
                attns.append(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, (jnp.stack(attns, axis=1) if collect_attn else None)
