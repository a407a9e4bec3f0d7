"""AR mel decoder stack.

Reference: ``Models/decoder.py:29-56`` — DecoderPreNet -> alpha-PE -> N x
DecoderLayer -> LayerNorm; returns (x, self-attns, cross-attns).

Incremental decoding support (NOT in the reference — its synthesis loop
re-forwards the whole prefix every step, test.py:158-184, O(T^3) total):
``__call__`` accepts per-layer self-attention KV caches, a ``cache_index``
and precomputed per-layer cross-attention K/V (``precompute_cross_kv``);
the caller drives a ``lax.while_loop`` over steps. The Tacotron2
zoneout-LSTM decoder variant lives in ``models/tacotron2_decoder.py``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from transformer_tts_tpu.models.layers import DecoderLayer
from transformer_tts_tpu.models.prenets import DecoderPreNet
from transformer_tts_tpu.ops.positional import PositionalEncoder


class Decoder(nn.Module):
    mel_dim: int                 # input dim (vocab_size in reference naming)
    d_model: int
    n_layers: int
    heads: int
    ff_kernel_size: int
    concat_after: bool = False
    dropout: float = 0.1
    dropout_prenet: float = 0.5
    spk_emb_dim: Optional[int] = None
    output_type: bool = False
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.decoder_prenet = DecoderPreNet(
            self.mel_dim, self.d_model, dropout=self.dropout_prenet,
            output_type=self.output_type, dtype=self.dtype)
        self.pe = PositionalEncoder(self.d_model, self.dropout,
                                    dtype=self.dtype)
        self.layers = [
            DecoderLayer(
                d_model=self.d_model, heads=self.heads,
                ff_kernel_size=self.ff_kernel_size, dropout=self.dropout,
                concat_after=self.concat_after,
                spk_emb_dim=self.spk_emb_dim, use_flash=self.use_flash,
                dtype=self.dtype)
            for _ in range(self.n_layers)]
        self.norm = nn.LayerNorm(dtype=self.dtype)

    def precompute_cross_kv(self, e_outputs):
        """Per-layer (k, v) cross-attention tensors, computed once."""
        return tuple(layer.cross_kv(e_outputs) for layer in self.layers)

    def __call__(self, trg, e_outputs, src_mask, trg_mask, spk_emb=None, *,
                 train: bool = True, collect_attn: bool = False,
                 caches=None, cache_index=None, pos_offset=0,
                 cross_kvs=None):
        """Full-sequence forward, or single-step when ``caches`` given.

        caches: tuple of n_layers (k_cache, v_cache) tuples, each
        (B, H, T_max, d_k); ``trg`` is then the (B, 1, mel) current frame
        and ``trg_mask`` must mask cache rows > cache_index.
        ``cross_kvs``: output of ``precompute_cross_kv`` (decode loop).
        """
        x = self.decoder_prenet(trg, train=train)
        if self.output_type:
            x = x.sum(axis=2)
        x = self.pe(x, train=train, offset=pos_offset)
        cross_k_len = self_k_len = None
        if self.use_flash and caches is None:
            if src_mask is not None and src_mask.shape[1] == 1:
                cross_k_len = src_mask[:, 0, :].sum(-1).astype(jnp.int32)
            if trg_mask is not None and trg_mask.ndim == 3 \
                    and trg_mask.shape[1] == trg_mask.shape[2]:
                # last row of (pad & causal) mask == the pad prefix mask
                self_k_len = trg_mask[:, -1, :].sum(-1).astype(jnp.int32)
        attns_self, attns_cross = [], []
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cross_cache = cross_kvs[i] if cross_kvs is not None else None
            if caches is not None:
                x, a1, a2, new_cache = layer(
                    x, e_outputs, src_mask, trg_mask, spk_emb, train=train,
                    collect_attn=collect_attn, self_cache=caches[i],
                    cross_cache=cross_cache, cache_index=cache_index)
                new_caches.append(new_cache)
            else:
                x, a1, a2 = layer(x, e_outputs, src_mask, trg_mask, spk_emb,
                                  train=train, collect_attn=collect_attn,
                                  cross_cache=cross_cache,
                                  self_k_len=self_k_len,
                                  cross_k_len=cross_k_len)
            if collect_attn:
                attns_self.append(a1)
                attns_cross.append(a2)
        x = self.norm(x)
        a_self = jnp.stack(attns_self, 1) if collect_attn else None
        a_cross = jnp.stack(attns_cross, 1) if collect_attn else None
        if caches is not None:
            return x, a_self, a_cross, tuple(new_caches)
        return x, a_self, a_cross
