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
    # CTC auxiliary tap (reference Models/encoder.py:186-187,216-218:
    # a Linear(d, ctc_classes) after layer ``ctc_layer``); consumed by
    # the legacy trainer's CTC loss (train_Fastspeech2.py:220-224)
    ctc_out: bool = False
    ctc_classes: int = 152
    ctc_layer: int = 2
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, spk_emb=None, accent=None, *,
                 train: bool = True, collect_attn: bool = False):
        assert not (self.ctc_out and self.intermediate_layers_out), \
            "ctc_out and intermediate_layers_out taps are exclusive"
        x = _embed_or_project(self.embedding, self.vocab_size, self.d_model,
                              self.dtype)(src)
        x = PositionalEncoder(self.d_model, self.dropout, dtype=self.dtype,
                              name="pe")(x, train=train)
        # flash path needs prefix pad masks expressed as per-batch lengths
        k_len = (mask[:, 0, :].sum(-1).astype(jnp.int32)
                 if (self.use_flash and mask is not None
                     and mask.shape[1] == 1) else None)
        attns = []
        intermediate_outs = []
        ctc_logits = None
        for i in range(self.n_layers):
            x, attn = EncoderLayer(
                d_model=self.d_model, heads=self.heads,
                ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
                concat_after=self.concat_after, spk_emb_dim=self.spk_emb_dim,
                use_flash=self.use_flash, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, mask, spk_emb, train=train, collect_attn=collect_attn,
              k_len=k_len)
            if collect_attn:
                attns.append(attn)
            if self.intermediate_layers_out and i in self.intermediate_layers_out:
                tap = nn.Dense(self.intermediate_dim, dtype=self.dtype,
                               name=f"intermediate_{i}")(x)
                intermediate_outs.append(tap)
            if self.ctc_out and i == min(self.ctc_layer, self.n_layers - 1):
                ctc_logits = nn.Dense(self.ctc_classes, dtype=self.dtype,
                                      name="ctc_linear")(x)
        if self.accent_emb and accent is not None:
            x = x + nn.Embed(self.n_accents, self.d_model, dtype=self.dtype,
                             name="acc_embed")(accent)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        attn_out = jnp.stack(attns, axis=1) if collect_attn else None
        if self.intermediate_layers_out:
            return x, attn_out, intermediate_outs
        if self.ctc_out:
            return x, attn_out, ctc_logits
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
    # same CTC tap contract as Encoder (reference encoder.py:216-218)
    ctc_out: bool = False
    ctc_classes: int = 152
    ctc_layer: int = 2
    use_flash: bool = False
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
        # flash path needs prefix pad masks expressed as per-batch
        # lengths; a (B, T, T) band mask (fix_mask) stays on the jnp path
        k_len = (mask[:, 0, :].sum(-1).astype(jnp.int32)
                 if (self.use_flash and mask is not None
                     and mask.shape[1] == 1) else None)
        attns = []
        ctc_logits = None
        for i in range(self.n_layers):
            x, attn = ConformerEncoderLayer(
                d_model=self.d_model, heads=self.heads,
                ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
                spk_emb_dim=self.spk_emb_dim, use_flash=self.use_flash,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, pos_emb, mask, spk_emb, train=train,
              collect_attn=collect_attn, k_len=k_len)
            if collect_attn:
                attns.append(attn)
            if self.ctc_out and i == min(self.ctc_layer, self.n_layers - 1):
                ctc_logits = nn.Dense(self.ctc_classes, dtype=self.dtype,
                                      name="ctc_linear")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        attn_out = jnp.stack(attns, axis=1) if collect_attn else None
        if self.ctc_out:
            return x, attn_out, ctc_logits
        return x, attn_out


class EncoderPostprocessing(nn.Module):
    """Encoder with gender/speaker embeddings + mid-stack CTC tap.

    Reference: ``Models/encoder.py:162-223`` — accent/gender/speaker-id
    embeddings added to the input, a 152-class CTC linear tap after layer 2
    (encoder.py:187,216-218), otherwise the plain Encoder stack.
    """
    vocab_size: int
    d_model: int
    n_layers: int
    heads: int
    ff_kernel_size: int
    concat_after: bool = False
    dropout: float = 0.1
    spk_emb_dim: Optional[int] = None
    embedding: bool = True
    accent_emb: bool = False
    gender_emb: bool = False
    speaker_emb: bool = False
    n_speakers: int = 247    # encoder.py:184
    ctc_out: bool = False
    ctc_classes: int = 152   # encoder.py:187
    ctc_layer: int = 2       # encoder.py:216
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, mask, spk_emb=None, accent=None, gender=None, *,
                 train: bool = True, collect_attn: bool = False):
        x = _embed_or_project(self.embedding, self.vocab_size, self.d_model,
                              self.dtype)(src)
        if self.accent_emb and accent is not None:
            x = x + nn.Embed(5, self.d_model, dtype=self.dtype,
                             name="acc_embed")(accent)
        if self.gender_emb:
            if gender is None:
                raise ValueError("gender_emb=True requires gender ids")
            x = x + nn.Embed(2, self.d_model, dtype=self.dtype,
                             name="gender_embed")(gender)[:, None, :]
        if self.speaker_emb:
            x = x + nn.Embed(self.n_speakers, self.d_model,
                             dtype=self.dtype,
                             name="speaker_embed")(spk_emb)[:, None, :]
        x = PositionalEncoder(self.d_model, self.dropout, dtype=self.dtype,
                              name="pe")(x, train=train)
        ctc_out = None
        attns = []
        for i in range(self.n_layers):
            x, attn = EncoderLayer(
                d_model=self.d_model, heads=self.heads,
                ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
                concat_after=self.concat_after, dtype=self.dtype,
                name=f"layers_{i}")(x, mask, None, train=train,
                                    collect_attn=collect_attn)
            if collect_attn:
                attns.append(attn)
            if self.ctc_out and i == self.ctc_layer:
                ctc_out = nn.Dense(self.ctc_classes, dtype=self.dtype,
                                   name="ctc_linear")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, ctc_out, (jnp.stack(attns, 1) if collect_attn else None)
