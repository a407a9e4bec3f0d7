"""Encoder / decoder blocks (pre-norm residual layout).

Reference: ``Models/layers.py``.

* ``EncoderLayer`` (layers.py:8-41): norm -> self-attn -> +res;
  norm -> (optional speaker bias) -> conv-FFN -> +res.
* ``ConformerEncoderLayer`` (layers.py:44-81): x + 0.5*FF1; norm; conv
  module *before* relative self-attn (a deliberate deviation the reference
  comments at layers.py:72); +res; (speaker add); x + FF2 (the reference
  does NOT halve FF2 — layers.py:80 — kept as-is).
* ``DecoderLayer`` (layers.py:84-125): masked self-attn, cross-attn over
  encoder output, conv-FFN; returns both attention maps. Supports a KV
  cache for incremental AR decode (self-attn cache updated in place,
  cross-attn K/V static).

Speaker conditioning (layers.py:20-27,36-39): x-vector (dim 512 -> Linear)
or speaker-id (Embedding), then ``softsign(Linear_nobias(e))`` added to the
normed hidden states.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.ops.attention import (
    MultiHeadAttention, RelativeMultiHeadAttention)
from transformer_tts_tpu.ops.feedforward import (
    ConvFeedForward, ConformerFeedForward, ConformerConvModule)


class SpeakerBias(nn.Module):
    """softsign(W @ embed(spk)) speaker bias (Models/layers.py:20-39)."""
    d_model: int
    spk_emb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spk_emb):
        if self.spk_emb_dim == 512:  # x-vector convention (layers.py:22)
            e = nn.Dense(self.d_model, dtype=self.dtype,
                         name="multi_emb")(spk_emb)
        else:
            e = nn.Embed(self.spk_emb_dim, self.d_model, dtype=self.dtype,
                         name="multi_emb")(spk_emb)
        e = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="speaker_L_l1_es")(e)
        return nn.soft_sign(e)[:, None, :]


class EncoderLayer(nn.Module):
    """Pre-norm transformer encoder block (Models/layers.py:8-41)."""
    d_model: int
    heads: int
    ff_kernel_size: int
    dropout: float = 0.1
    concat_after: bool = False
    spk_emb_dim: Optional[int] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, spk_emb=None, *, train: bool = True,
                 collect_attn: bool = False, k_len=None):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm_1")(x)
        out, attn = MultiHeadAttention(
            heads=self.heads, d_model=self.d_model, dropout=self.dropout,
            concat_after=self.concat_after, use_flash=self.use_flash,
            dtype=self.dtype, name="attn",
        )(h, h, h, mask, train=train, collect_attn=collect_attn,
          k_len=k_len)
        x = res + drop(out)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm_2")(x)
        if self.spk_emb_dim is not None and spk_emb is not None:
            h = h + SpeakerBias(self.d_model, self.spk_emb_dim,
                                dtype=self.dtype, name="spk_bias")(spk_emb)
        ff = ConvFeedForward(self.d_model, self.ff_kernel_size,
                             self.dropout, dtype=self.dtype, name="ff")
        x = res + drop(ff(h, train=train))
        return x, attn


class ConformerEncoderLayer(nn.Module):
    """Conformer block, conv before attention (Models/layers.py:44-81)."""
    d_model: int
    heads: int
    ff_kernel_size: int
    dropout: float = 0.1
    spk_emb_dim: Optional[int] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_emb, mask, spk_emb=None, *, train: bool = True,
                 collect_attn: bool = False, k_len=None):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        x = x + 0.5 * ConformerFeedForward(
            self.d_model, self.d_model * 2, self.dropout,
            dtype=self.dtype, name="ff_1")(x, train=train)
        res = x
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        h = h + ConformerConvModule(
            self.d_model, dropout=self.dropout, dtype=self.dtype,
            name="conv_module")(h, train=train)
        out, attn = RelativeMultiHeadAttention(
            heads=self.heads, d_model=self.d_model, dropout=self.dropout,
            use_flash=self.use_flash, dtype=self.dtype, name="attn",
        )(h, h, h, pos_emb, mask, train=train, collect_attn=collect_attn,
          k_len=k_len)
        x = res + drop(out)
        if self.spk_emb_dim is not None and spk_emb is not None:
            # layers.py:77-79 adds the raw embedding (no softsign here)
            if self.spk_emb_dim == 512:
                e = nn.Dense(self.d_model, dtype=self.dtype,
                             name="multi_emb")(spk_emb)
            else:
                e = nn.Embed(self.spk_emb_dim, self.d_model,
                             dtype=self.dtype, name="multi_emb")(spk_emb)
            x = x + e[:, None, :]
        x = x + drop(ConformerFeedForward(
            self.d_model, self.d_model * 2, self.dropout,
            dtype=self.dtype, name="ff_2")(x, train=train))
        return x, attn


class DecoderLayer(nn.Module):
    """AR decoder block with self + cross attention (Models/layers.py:84-125)."""
    d_model: int
    heads: int
    ff_kernel_size: int
    dropout: float = 0.1
    concat_after: bool = False
    spk_emb_dim: Optional[int] = None
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm_1 = nn.LayerNorm(dtype=self.dtype)
        self.norm_2 = nn.LayerNorm(dtype=self.dtype)
        self.norm_3 = nn.LayerNorm(dtype=self.dtype)
        mha = lambda: MultiHeadAttention(  # noqa: E731
            heads=self.heads, d_model=self.d_model, dropout=self.dropout,
            concat_after=self.concat_after, use_flash=self.use_flash,
            dtype=self.dtype)
        self.attn_1 = mha()
        self.attn_2 = mha()
        self.ff = ConvFeedForward(self.d_model, self.ff_kernel_size,
                                  self.dropout, dtype=self.dtype)
        if self.spk_emb_dim is not None:
            self.spk_bias = SpeakerBias(self.d_model, self.spk_emb_dim,
                                        dtype=self.dtype)

    def cross_kv(self, e_outputs):
        """Precompute this layer's cross-attention K/V (AR decode hoist)."""
        return self.attn_2.project_kv(e_outputs, e_outputs)

    @nn.compact
    def __call__(self, x, e_outputs, src_mask, trg_mask, spk_emb=None, *,
                 train: bool = True, collect_attn: bool = False,
                 self_cache: Optional[Tuple] = None,
                 cross_cache: Optional[Tuple] = None,
                 cache_index=None, self_k_len=None, cross_k_len=None):
        """Returns (x, attn_self, attn_cross[, new_self_cache]).

        ``self_cache``/``cache_index``: static-shape KV cache for scan
        decoding. ``cross_cache``: precomputed encoder K/V head tensors
        from ``cross_kv`` — constant across decode steps, so computing
        them once outside the loop removes the dominant per-step cost.
        """
        drop = nn.Dropout(self.dropout, deterministic=not train)
        res = x
        h = self.norm_1(x)
        new_self_cache = None
        if self_cache is not None:
            out, attn_1, new_self_cache = self.attn_1(
                h, h, h, trg_mask, train=train, collect_attn=collect_attn,
                cache=self_cache, cache_index=cache_index)
        else:
            out, attn_1 = self.attn_1(h, h, h, trg_mask, train=train,
                                      collect_attn=collect_attn,
                                      k_len=self_k_len, causal=True)
        x = res + drop(out)
        res = x
        h = self.norm_2(x)
        out, attn_2 = self.attn_2(
            h, e_outputs, e_outputs, src_mask, train=train,
            collect_attn=collect_attn, k_len=cross_k_len,
            precomputed_kv=cross_cache)
        x = res + drop(out)
        res = x
        h = self.norm_3(x)
        if self.spk_emb_dim is not None and spk_emb is not None:
            h = h + self.spk_bias(spk_emb)
        x = res + drop(self.ff(h, train=train))
        if self_cache is not None:
            return x, attn_1, attn_2, new_self_cache
        return x, attn_1, attn_2
