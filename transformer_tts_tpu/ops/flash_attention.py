"""Pallas flash attention for TPU.

Blockwise-softmax attention that never materializes the (B, H, T_q, T_k)
score matrix in HBM — the reference materializes per-layer attention maps
for EVERY forward (Models/encoder.py:96-105), which on TPU is pure HBM
bandwidth waste. Used by MultiHeadAttention when attention maps are not
requested (``collect_attn=False``) and the mask is expressible as
(causal?, per-batch key length) — which covers every model in this
framework except the ``fix_mask`` band-diagonal debug mode.

Semantics vs the reference (Models/modules.py:7-21):
* reference fills masked logits with -1e4 then softmaxes in fp32; here
  masked logits get -inf-like exclusion via the running-max trick. For
  valid (non-fully-masked) query rows the results agree to ~exp(-1e4)
  (i.e. exactly, in fp32). Fully-masked rows (query padding) produce 0
  here vs uniform-average there — both are garbage masked out downstream.
* softmax accumulates in fp32 regardless of input dtype; matmuls hit the
  MXU in the input dtype.

Backward pass: recompute-based flash backward (dQ, dK, dV) as a second
Pallas kernel; wired through jax.custom_vjp.

Block sizes default to (128, 128) query/key tiles (MXU-aligned); the head
dim is padded to a multiple of 128 lanes by XLA automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _fwd_kernel(k_len_ref, q_ref, k_ref, v_ref, o_ref,
                m_ref, l_ref, acc_ref, *,
                causal: bool, sm_scale: float):
    """Grid: (B*H, num_q_blocks, num_k_blocks) — k innermost.

    K/V arrive as (1, block_k, d) blocks via BlockSpec, so Pallas
    double-buffers the HBM->VMEM DMAs across grid steps (the previous
    version indexed a whole-(T_k, d) VMEM ref with an inner fori_loop,
    which defeats the automatic pipeline). Running max/sum/accumulator
    live in VMEM scratch, persisting across the k dimension of the grid.
    """
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    k_len = k_len_ref[bh]
    q_offset = qi * block_q
    k_offset = ki * block_k

    def _update():
        q = q_ref[0].astype(jnp.float32) * sm_scale       # (bq, d)
        k_blk = k_ref[0].astype(jnp.float32)              # (bk, d)
        v_blk = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, bk)

        col = k_offset + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < k_len
        if causal:
            row = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # explicit zeroing handles fully-masked rows (max == NEG_INF
        # would otherwise make exp(s - m) == 1 for masked entries)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:] = m_new
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # key blocks entirely above the diagonal contribute nothing
        pl.when(k_offset <= q_offset + block_q - 1)(_update)
    else:
        _update()

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_ref[:]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)


def _flash_fwd(q, k, v, k_len, *, causal: bool, sm_scale: float,
               block_q: int, block_k: int, interpret: bool):
    b, h, t_q_orig, d = q.shape
    t_k_orig = k.shape[2]
    block_q_eff = min(block_q, max(t_q_orig, 8))
    block_k_eff = min(block_k, max(t_k_orig, 8))
    # pad sequence dims to block multiples; padded keys masked via k_len
    t_q = -(-t_q_orig // block_q_eff) * block_q_eff
    t_k = -(-t_k_orig // block_k_eff) * block_k_eff
    if t_q != t_q_orig:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_q - t_q_orig), (0, 0)))
    if t_k != t_k_orig:
        pad = ((0, 0), (0, 0), (0, t_k - t_k_orig), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    block_q, block_k = block_q_eff, block_k_eff

    bh = b * h
    q_r = q.reshape(bh, t_q, d)
    k_r = k.reshape(bh, t_k, d)
    v_r = v.reshape(bh, t_k, d)
    k_len_bh = jnp.repeat(k_len.astype(jnp.int32), h)    # (B*H,)

    grid = (bh, pl.cdiv(t_q, block_q), pl.cdiv(t_k, block_k))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, causal=causal, sm_scale=sm_scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d),
                             lambda bh, qi, ki, *_: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d),
                             lambda bh, qi, ki, *_: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d),
                             lambda bh, qi, ki, *_: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda bh, qi, ki, *_: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),   # running max
                pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
                pltpu.VMEM((block_q, d), jnp.float32),   # accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_q, d), q.dtype),
        interpret=interpret,
    )(k_len_bh, q_r, k_r, v_r)
    return out.reshape(b, h, t_q, d)[:, :, :t_q_orig, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention(q, k, v, k_len, causal=False, sm_scale=None,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    interpret=False):
    """softmax(QK^T * sm_scale, masked)V without materializing scores.

    Args:
      q: (B, H, T_q, d); k, v: (B, H, T_k, d).
      k_len: (B,) int32 — number of valid key positions per batch row.
      causal: lower-triangular masking (query i attends keys <= i).
      sm_scale: logit scale; default 1/sqrt(d) (reference modules.py:9).
    Returns (B, H, T_q, d) in q.dtype.
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    return _flash_fwd(q, k, v, k_len, causal=causal, sm_scale=sm_scale,
                      block_q=block_q, block_k=block_k,
                      interpret=interpret)


def _flash_fwd_rule(q, k, v, k_len, causal, sm_scale, block_q, block_k,
                    interpret):
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    out = _flash_fwd(q, k, v, k_len, causal=causal, sm_scale=sm_scale,
                     block_q=block_q, block_k=block_k, interpret=interpret)
    return out, (q, k, v, k_len, out)


def _flash_bwd_rule(causal, sm_scale, block_q, block_k, interpret,
                    residuals, g):
    """Recompute-based backward in plain XLA.

    The backward runs once per training step per layer; recomputing the
    (block-free) attention here is O(T^2) HBM for the backward only —
    half the reference's footprint — and XLA fuses the chain well. A full
    Pallas backward kernel is a later optimization.
    """
    q, k, v, k_len, out = residuals
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
    t_q, t_k = q.shape[2], k.shape[2]
    mask = jnp.arange(t_k)[None, :] < k_len[:, None]     # (B, T_k)
    mask = mask[:, None, None, :]
    if causal:
        cmask = (jnp.arange(t_q)[:, None] >= jnp.arange(t_k)[None, :])
        mask = mask & cmask[None, None]
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # rows with no valid keys: softmax of all -inf -> make them 0
    p = jnp.where(mask.any(-1, keepdims=True), p, 0.0)

    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta) * sm_scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def reference_attention(q, k, v, k_len, causal=False, sm_scale=None):
    """jnp oracle with the same masking semantics (for tests)."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    t_q, t_k = q.shape[2], k.shape[2]
    mask = jnp.arange(t_k)[None, :] < k_len[:, None]
    mask = mask[:, None, None, :]
    if causal:
        cmask = (jnp.arange(t_q)[:, None] >= jnp.arange(t_k)[None, :])
        mask = mask & cmask[None, None]
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask.any(-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        q.dtype)
