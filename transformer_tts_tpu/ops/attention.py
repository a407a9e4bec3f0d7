"""Multi-head attention (absolute and Transformer-XL relative variants).

Reference semantics preserved (Models/modules.py:7-70, 201-283):

* logits = QK^T / sqrt(d_k); masked positions filled with **-1e4**
  (AMP/bf16-safe fill, modules.py:14) before softmax; relative variant
  fills with -2**15 (modules.py:275).
* dropout applied to the attention *probabilities*.
* separate q/k/v input projections (distinct input dims allowed — GST's
  StyleTokenLayer queries with a 128-d vector against 384-d tokens).
* optional ``concat_after``: concat(query_input, context) -> Linear(2d, d).

TPU-first deltas:

* softmax runs in fp32 regardless of compute dtype (bf16 matmuls feed an
  fp32-stable softmax) — matches AMP behavior without a GradScaler.
* attention maps are returned ONLY when ``collect_attn=True``; the reference
  always materializes (B, N_layers, H, T, T) maps per stack
  (Models/encoder.py:96-105) which is pure HBM waste on TPU.
* when maps are not needed the core can dispatch to a fused Pallas
  flash-attention kernel (ops/flash_attention.py).
* KV-cache support for incremental AR decode: pass ``cache=(k, v)`` of
  static length and a ``cache_index``; replaces the reference's
  re-run-the-whole-prefix loop (test.py:158-184).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_FILL = -1e4        # Models/modules.py:14
NEG_FILL_REL = -(2.0 ** 15)  # Models/modules.py:275

# Minimum key length for the Pallas flash kernel. Honest A/B of the
# round-2 kernel (host-synced slope timing, scripts/flash_ab.py,
# B=32 H=4 d=96 bf16, v5e): training path (fwd+bwd, attention-prob
# dropout 0.1) flash wins at every length — T=256: 0.31 vs 2.75 ms,
# T=512: 1.03 vs 1.57, T=1024: 4.20 vs 8.58; eval fwd at T=1024:
# 1.51 vs 3.06. Below ~256 the eval-path results are noise-level
# (<1.5 ms absolute) and XLA sometimes edges ahead, so dispatch starts
# at 256.
FLASH_MIN_KEY_LEN = 256


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    dropout: Optional[nn.Dropout] = None,
    neg_fill: float = NEG_FILL,
    bias: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core softmax(QK^T/sqrt(dk))V on (B, H, T, dk) tensors.

    ``mask``: (B, 1 or T_q, T_k) bool, True = attend (broadcast over heads).
    ``bias``: optional additive logits (relative-position term).
    Returns (context (B, H, T_q, dk), probs (B, H, T_q, T_k) fp32).
    """
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(d_k))
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, neg_fill)
    probs = nn.softmax(scores.astype(jnp.float32), axis=-1)
    if dropout is not None:
        probs = dropout(probs)
    context = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return context, probs


class MultiHeadAttention(nn.Module):
    """Reference-compatible MHA (Models/modules.py:23-70).

    ``use_flash``: dispatch to the Pallas flash kernel
    (ops/flash_attention.py) when the mask is a prefix pad mask expressed
    as ``k_len`` (+ optional ``causal``), attention maps are not
    requested, no KV cache is in play, and attention-prob dropout is
    inactive (eval, or dropout rate 0 — flash skips prob-dropout, so the
    jnp path keeps training parity with the reference).
    """
    heads: int
    d_model: int
    dropout: float = 0.1
    concat_after: bool = False
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.q_linear = nn.Dense(self.d_model, dtype=self.dtype)
        self.k_linear = nn.Dense(self.d_model, dtype=self.dtype)
        self.v_linear = nn.Dense(self.d_model, dtype=self.dtype)
        self.out = nn.Dense(self.d_model, dtype=self.dtype)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        d_k = self.d_model // self.heads
        return x.reshape(b, -1, self.heads, d_k).transpose(0, 2, 1, 3)

    def project_kv(self, k_in: jnp.ndarray, v_in: jnp.ndarray):
        """Precompute (k, v) head tensors — used to hoist the
        cross-attention projections out of the AR decode loop (the
        reference recomputes them every step, test.py:158-184)."""
        return self._heads(self.k_linear(k_in)), \
            self._heads(self.v_linear(v_in))

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,
        k_in: jnp.ndarray,
        v_in: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        collect_attn: bool = False,
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        k_len: Optional[jnp.ndarray] = None,
        causal: bool = False,
        precomputed_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Returns (output, attn_or_None[, updated_cache]).

        Incremental decode: with ``cache=(k_cache, v_cache)`` of shape
        (B, H, T_max, d_k) and ``cache_index`` = current step, the new k/v
        rows are written at ``cache_index`` and attention runs over the full
        static cache (caller masks out future rows). ``precomputed_kv``
        short-circuits the k/v projections entirely (static cross-attention
        keys during AR decode).
        """
        b = q_in.shape[0]
        q = self._heads(self.q_linear(q_in))
        if precomputed_kv is not None:
            k, v = precomputed_kv
        else:
            k, v = self.project_kv(k_in, v_in)

        new_cache = None
        if cache is not None:
            k_cache, v_cache = cache
            if cache_index is None:
                raise ValueError("cache requires cache_index")
            k = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k.astype(k_cache.dtype), cache_index, axis=2)
            v = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v.astype(v_cache.dtype), cache_index, axis=2)
            new_cache = (k, v)

        dropout_active = train and self.dropout > 0.0
        flash_ok = (self.use_flash and not collect_attn
                    and cache is None and k_len is not None
                    and k.shape[2] >= FLASH_MIN_KEY_LEN
                    and jax.default_backend() != "cpu")
        if flash_ok and mask is not None and mask.shape[1] != 1 \
                and not causal:
            # flash mask contract: k_len = contiguous prefix key mask;
            # the only structured mask it can express is the causal
            # triangle (causal=True). Anything else (e.g. fix_mask
            # bands) must stay on the jnp path (k_len=None).
            raise ValueError(
                "k_len with a structured (B, T, T) mask requires "
                "causal=True; pass k_len=None for arbitrary masks")
        if flash_ok:
            from transformer_tts_tpu.ops.flash_attention import (
                flash_attention)
            if dropout_active:
                # in-kernel attention-prob dropout: derive a scalar seed
                # from the flax dropout stream (fresh per step/layer);
                # the (B,H,T,T) keep mask never touches HBM
                seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                ).astype(jnp.int32)
                context = flash_attention(
                    q, k, v, k_len, causal=causal,
                    dropout_rate=self.dropout, dropout_seed=seed)
            else:
                context = flash_attention(q, k, v, k_len, causal=causal)
            probs = None
        else:
            drop = nn.Dropout(self.dropout, deterministic=not train)
            context, probs = scaled_dot_attention(q, k, v, mask,
                                                  dropout=drop)

        concat = context.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        if self.concat_after:
            concat = jnp.concatenate([q_in, concat], axis=-1)
        out = self.out(concat)

        attn = probs if collect_attn else None
        if cache is not None:
            return out, attn, new_cache
        return out, attn


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Transformer-XL relative shift (Models/modules.py:256-267).

    x: (B, H, T_q, T_pos) -> shifted so column j aligns with offset (j - i).
    """
    b, h, t1, t2 = x.shape
    zero_pad = jnp.zeros((b, h, t1, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(b, h, t2 + 1, t1)
    return x_padded[:, :, 1:].reshape(b, h, t1, t2)


class RelativeMultiHeadAttention(nn.Module):
    """Transformer-XL style relative MHA (Models/modules.py:201-283).

    ``use_flash``: dispatch to the relative-position Pallas kernel
    (ops/flash_relpos.py) — the (ac+bd) logits math is identical to the
    jnp path, including the reference rel_shift's wrapped future-offset
    values, but the bias, the probabilities, the softmax temporaries,
    and the dropout mask never exist in HBM: each tile of
    rel_shift(q_v P^T) is computed in-kernel from a contiguous slice of
    the projected position table (round 2 materialized a (B,H,T,T)
    bf16 bias as a kernel input — the conformer family's 2.2x tax).

    Flash-path mask contract: ``k_len`` asserts the mask is a
    CONTIGUOUS PREFIX key-padding mask ((B, 1, T), True for the first
    k_len[b] keys). Passing a structured/band mask (mask.shape[1] > 1)
    together with k_len is rejected at trace time; such masks must use
    the jnp path (k_len=None).
    """
    heads: int
    d_model: int
    dropout: float = 0.1
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, pos_emb, mask=None, *,
                 train: bool = True, collect_attn: bool = False,
                 k_len: Optional[jnp.ndarray] = None):
        d_k = self.d_model // self.heads
        b = q_in.shape[0]
        dense = lambda name, **kw: nn.Dense(  # noqa: E731
            self.d_model, dtype=self.dtype, name=name, **kw)

        q = dense("q_linear")(q_in).reshape(b, -1, self.heads, d_k)
        k = dense("k_linear")(k_in).reshape(b, -1, self.heads, d_k)
        v = dense("v_linear")(v_in).reshape(b, -1, self.heads, d_k)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        p = dense("linear_pos", use_bias=False)(pos_emb)
        p = p.reshape(pos_emb.shape[0], -1, self.heads, d_k)
        p = p.transpose(0, 2, 1, 3)

        xavier = nn.initializers.xavier_uniform()
        pos_bias_u = self.param("pos_bias_u", xavier, (self.heads, d_k))
        pos_bias_v = self.param("pos_bias_v", xavier, (self.heads, d_k))

        q_u = (q + pos_bias_u.astype(q.dtype)).transpose(0, 2, 1, 3)
        q_v = (q + pos_bias_v.astype(q.dtype)).transpose(0, 2, 1, 3)

        dropout_active = train and self.dropout > 0.0
        flash_ok = (self.use_flash and not collect_attn
                    and k_len is not None
                    and k.shape[2] >= FLASH_MIN_KEY_LEN
                    and q_u.shape == k.shape        # self-attn only
                    and p.shape[0] == 1             # shared pos table
                    and jax.default_backend() != "cpu")
        if k_len is not None and mask is not None and mask.shape[1] != 1:
            raise ValueError(
                "k_len implies a contiguous prefix key mask; structured "
                "masks (mask.shape[1] > 1) must use the jnp path "
                "(pass k_len=None)")
        if flash_ok:
            from transformer_tts_tpu.ops.flash_relpos import (
                flash_relpos_attention)
            seed = None
            if dropout_active:
                seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                ).astype(jnp.int32)
            context = flash_relpos_attention(
                q_u, q_v, k, v, p[0], k_len,
                dropout_rate=self.dropout if dropout_active else 0.0,
                dropout_seed=seed)
            probs = None
        else:
            matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                                   preferred_element_type=jnp.float32)
            matrix_bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, p,
                                   preferred_element_type=jnp.float32)
            matrix_bd = rel_shift(matrix_bd)
            scores = (matrix_ac + matrix_bd) / jnp.sqrt(jnp.float32(d_k))

            if mask is not None:
                scores = jnp.where(mask[:, None, :, :], scores,
                                   NEG_FILL_REL)
            probs = nn.softmax(scores.astype(jnp.float32), axis=-1)
            probs = nn.Dropout(self.dropout, deterministic=not train)(probs)
            context = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)

        concat = context.transpose(0, 2, 1, 3).reshape(b, -1, self.d_model)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="out")(concat)
        return out, (probs if collect_attn else None)
