"""Pallas flash attention for TPU (fwd + bwd kernels, in-kernel dropout).

Blockwise-softmax attention that never materializes the (B, H, T_q, T_k)
score matrix in HBM — the reference materializes per-layer attention maps
for EVERY forward (Models/encoder.py:96-105), which on TPU is pure HBM
bandwidth waste. Used by MultiHeadAttention when attention maps are not
requested (``collect_attn=False``) and the mask is expressible as
(causal?, per-batch key length) — which covers every model in this
framework except the ``fix_mask`` band-diagonal debug mode.

Semantics vs the reference (Models/modules.py:7-21):

* reference fills masked logits with -1e4 then softmaxes in fp32; here
  masked logits are excluded exactly (running-max trick). For valid
  query rows the results agree to ~exp(-1e4) (i.e. exactly, in fp32).
  Fully-masked rows (query padding) produce 0 here vs uniform-average
  there — both are garbage masked out downstream.
* softmax statistics accumulate in fp32; the QK^T and PV matmuls run on
  the MXU in the INPUT dtype (bf16 under amp) with fp32 accumulation —
  identical to the jnp path's ``preferred_element_type=f32`` einsums
  followed by ``probs.astype(v.dtype)``.
* attention-prob dropout (modules.py:18-19) runs INSIDE the kernel:
  the keep mask is a counter-based hash (murmur3 finalizer) of the
  GLOBAL (batch-head, q-pos, k-pos) coordinates mixed with a per-call
  seed, applied to the normalized probabilities (scaled 1/keep), and
  REGENERATED in the backward kernels instead of stored — the (B,H,T,T)
  mask never touches HBM. The stream differs from flax's jax-PRNG
  dropout (distributional, not bitwise, parity — same as the
  reference's torch stream differing from ours).

Backward: FlashAttention-2 style Pallas kernels — a dq kernel
(grid over q-blocks, streaming k) and a dk/dv kernel (grid over
k-blocks, streaming q), both recomputing probabilities from the saved
row logsumexp; ``delta = rowsum(dO * O)`` is a cheap XLA reduction.

Default blocks: q 256, k 1024 (MXU-aligned, VMEM-sized for d<=128; the
r2 on-chip (block_q, block_k) sweep at B=32 H=4 T=1024 d=96 fwd+bwd
dropout: (256,1024) 3.51 ms vs (256,512) 4.21 ms vs (128,256) 8.0 ms —
a full-row k block eliminates the running-softmax rescale passes at the
bucket lengths this framework trains on; longer sequences fall back to
streaming k blocks automatically).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _keep_mask(seed, bh, q_offset, k_offset, shape, dropout_rate: float):
    """(keep / keep_prob) scale tile, counter-based.

    Bits come from a murmur3-finalizer hash of the GLOBAL coordinates
    (bh, q position, k position) mixed with the seed — a stateless,
    blocking-independent generator, so the backward kernels regenerate
    the exact forward mask from coordinates alone (nothing stored), any
    block size agrees with any other, and it runs identically in
    compiled TPU mode and interpreter mode (pure uint32 VPU ops; the
    stateful pltpu PRNG is unavailable in interpret mode).
    """
    u32 = jnp.uint32
    row = (q_offset.astype(u32)
           + jax.lax.broadcasted_iota(u32, shape, 0))
    col = (k_offset.astype(u32)
           + jax.lax.broadcasted_iota(u32, shape, 1))
    x = seed.astype(u32)
    x = x + bh.astype(u32) * u32(0x9E3779B9)
    x = x + row * u32(0x85EBCA6B)
    x = x + col * u32(0xC2B2AE35)
    # murmur3 fmix32: full avalanche over the combined counter
    x = x ^ (x >> u32(16))
    x = x * u32(0x85EBCA6B)
    x = x ^ (x >> u32(13))
    x = x * u32(0xC2B2AE35)
    x = x ^ (x >> u32(16))
    threshold = u32(int(dropout_rate * (2 ** 32)))
    keep = x >= threshold                     # P(keep) = 1 - rate
    return keep.astype(jnp.float32) / (1.0 - dropout_rate)


def _fwd_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, *rest,
                causal: bool, sm_scale: float, dropout_rate: float,
                has_bias: bool = False):
    """Grid: (B*H, num_q_blocks, num_k_blocks) — k innermost.

    K/V arrive as (1, block_k, d) blocks via BlockSpec (Pallas
    double-buffers the HBM->VMEM DMAs across grid steps). Running
    max/sum and the (dropped) output accumulator live in VMEM scratch,
    persisting across the k grid dimension. Matmuls run in the input
    dtype (bf16 under amp) with fp32 accumulation.

    ``has_bias``: an extra (1, block_q, block_k) additive-logits block
    (the relative-position term, added BEFORE the sm_scale like the
    reference's (ac+bd)/sqrt(dk) — Models/modules.py:254).
    """
    if has_bias:
        bias_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        bias_ref = None
        o_ref, lse_ref, m_ref, l_ref, acc_ref = rest
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
        q = q_ref[0]                                      # (bq, d) input dtype
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, bk) fp32
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        s = s * sm_scale

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
        # normalizer uses UNdropped p; dropout only gates the numerator
        l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
        if dropout_rate > 0.0:
            p = p * _keep_mask(seed_ref[0], bh, q_offset, k_offset,
                               (block_q, block_k), dropout_rate)
        acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
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
        # row logsumexp for the backward recompute; NEG_INF-ish for
        # fully-masked rows (backward re-masks explicitly anyway)
        lse_ref[0, 0] = (m_ref[:] + jnp.log(safe_l))[:, 0]


def _pad_seqs(q, k, v, block_q, block_k):
    t_q_orig, t_k_orig = q.shape[2], k.shape[2]
    block_q = min(block_q, max(t_q_orig, 8))
    block_k = min(block_k, max(t_k_orig, 8))
    t_q = -(-t_q_orig // block_q) * block_q
    t_k = -(-t_k_orig // block_k) * block_k
    if t_q != t_q_orig:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_q - t_q_orig), (0, 0)))
    if t_k != t_k_orig:
        pad = ((0, 0), (0, 0), (0, t_k - t_k_orig), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    return q, k, v, block_q, block_k


def _pad_bias(bias, t_q, t_k):
    if bias is None:
        return None
    pq, pk = t_q - bias.shape[2], t_k - bias.shape[3]
    if pq or pk:
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pq), (0, pk)))
    return bias


def _flash_fwd(q, k, v, k_len, *, causal, sm_scale, dropout_rate, seed,
               block_q, block_k, interpret, bias=None):
    b, h, t_q_orig, d = q.shape
    q, k, v, block_q, block_k = _pad_seqs(q, k, v, block_q, block_k)
    t_q, t_k = q.shape[2], k.shape[2]
    bias = _pad_bias(bias, t_q, t_k)

    bh = b * h
    q_r = q.reshape(bh, t_q, d)
    k_r = k.reshape(bh, t_k, d)
    v_r = v.reshape(bh, t_k, d)
    k_len_bh = jnp.repeat(k_len.astype(jnp.int32), h)    # (B*H,)
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)

    in_specs = [
        pl.BlockSpec((1, block_q, d),
                     lambda bh, qi, ki, *_: (bh, qi, 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda bh, qi, ki, *_: (bh, ki, 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda bh, qi, ki, *_: (bh, ki, 0)),
    ]
    inputs = [k_len_bh, seed_arr, q_r, k_r, v_r]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, block_q, block_k), lambda bh, qi, ki, *_: (bh, qi, ki)))
        inputs.append(bias.reshape(bh, t_q, t_k))

    grid = (bh, pl.cdiv(t_q, block_q), pl.cdiv(t_k, block_k))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, causal=causal, sm_scale=sm_scale,
                          dropout_rate=dropout_rate,
                          has_bias=bias is not None),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_q, d),
                             lambda bh, qi, ki, *_: (bh, qi, 0)),
                # (bh, 1, t_q) layout: TPU blocks need the 2nd-to-last
                # dim 8-divisible or full — a singleton middle dim is
                # "full", and block_q is lane-aligned
                pl.BlockSpec((1, 1, block_q),
                             lambda bh, qi, ki, *_: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),   # running max
                pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
                pltpu.VMEM((block_q, d), jnp.float32),   # accumulator
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t_q), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    out = out.reshape(b, h, t_q, d)[:, :, :t_q_orig, :]
    lse = lse.reshape(b, h, t_q)[:, :, :t_q_orig]
    return out, lse


def _dq_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
               delta_ref, *rest, causal: bool, sm_scale: float,
               dropout_rate: float, has_bias: bool = False):
    """Grid: (B*H, num_q_blocks, num_k_blocks) — accumulate dq over k.

    dS = P * (mask/keep * (dO K V^T-term) - delta); dq = dS @ K * scale.
    P is recomputed from the saved logsumexp. With ``has_bias`` the
    recompute adds the bias block, and dS (the gradient of the pre-scale
    logits, identical for the QK^T and bias terms) is also written out
    as the dbias block for this (qi, ki) tile.
    """
    if has_bias:
        bias_ref, dq_out_ref, dbias_out_ref, dq_acc_ref = rest
    else:
        bias_ref = dbias_out_ref = None
        dq_out_ref, dq_acc_ref = rest
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    k_len = k_len_ref[bh]
    q_offset = qi * block_q
    k_offset = ki * block_k

    def _compute_ds():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        s = s * sm_scale
        col = k_offset + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < k_len
        if causal:
            row = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        lse = lse_ref[0, 0][:, None]                      # (bq, 1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)        # (bq, bk) fp32
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (bq, bk)
        if dropout_rate > 0.0:
            dp = dp * _keep_mask(seed_ref[0], bh, q_offset, k_offset,
                                 (block_q, block_k), dropout_rate)
        return p * (dp - delta_ref[0, 0][:, None]) * sm_scale

    def _update():
        ds = _compute_ds()
        if dbias_out_ref is not None:
            dbias_out_ref[0] = ds.astype(dbias_out_ref.dtype)
        dq_acc_ref[:] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # skipped blocks still own an output tile: zero it
        if dbias_out_ref is not None:
            @pl.when(k_offset > q_offset + block_q - 1)
            def _zero():
                dbias_out_ref[0] = jnp.zeros_like(dbias_out_ref[0])
        pl.when(k_offset <= q_offset + block_q - 1)(_update)
    else:
        _update()

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_out_ref[0] = dq_acc_ref[:].astype(dq_out_ref.dtype)


def _dkdv_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                 lse_ref, delta_ref, *rest,
                 causal: bool, sm_scale: float, dropout_rate: float,
                 has_bias: bool = False):
    """Grid: (B*H, num_k_blocks, num_q_blocks) — accumulate dk/dv over q."""
    if has_bias:
        bias_ref, dk_out_ref, dv_out_ref, dk_acc_ref, dv_acc_ref = rest
    else:
        bias_ref = None
        dk_out_ref, dv_out_ref, dk_acc_ref, dv_acc_ref = rest
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    k_len = k_len_ref[bh]
    q_offset = qi * block_q
    k_offset = ki * block_k

    def _update():
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        s = s * sm_scale
        col = k_offset + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col < k_len
        if causal:
            row = q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (col <= row)
        lse = lse_ref[0, 0][:, None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)        # (bq, bk)
        keep = None
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref[0], bh, q_offset, k_offset,
                              (block_q, block_k), dropout_rate)
        p_dropped = p * keep if keep is not None else p
        # dv += P_d^T dO — contract over the q dim, no explicit transpose
        dv_acc_ref[:] += jax.lax.dot_general(
            p_dropped.astype(do_ref.dtype), do_ref[0],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - delta_ref[0, 0][:, None]) * sm_scale   # (bq, bk)
        dk_acc_ref[:] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        pl.when(k_offset <= q_offset + block_q - 1)(_update)
    else:
        _update()

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_out_ref[0] = dk_acc_ref[:].astype(dk_out_ref.dtype)
        dv_out_ref[0] = dv_acc_ref[:].astype(dv_out_ref.dtype)


def _flash_bwd(q, k, v, k_len, out, lse, g, *, causal, sm_scale,
               dropout_rate, seed, block_q, block_k, interpret,
               bias=None):
    b, h, t_q_orig, d = q.shape
    t_k_orig = k.shape[2]
    # delta = rowsum(dO * O): cheap elementwise XLA reduction
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                               # (b, h, t_q)

    q, k, v, block_q, block_k = _pad_seqs(q, k, v, block_q, block_k)
    t_q, t_k = q.shape[2], k.shape[2]
    bias = _pad_bias(bias, t_q, t_k)
    if t_q != t_q_orig:
        pad = ((0, 0), (0, 0), (0, t_q - t_q_orig))
        g = jnp.pad(g, pad + ((0, 0),))
        # large positive lse => recomputed p == 0 for padded q rows, so
        # they contribute nothing to dk/dv (1e30 not inf: NEG_INF-1e30
        # stays finite, exp -> 0, no inf-inf NaN)
        lse = jnp.pad(lse, pad, constant_values=1e30)
        delta = jnp.pad(delta, pad)

    bh = b * h
    q_r = q.reshape(bh, t_q, d)
    k_r = k.reshape(bh, t_k, d)
    v_r = v.reshape(bh, t_k, d)
    do_r = g.reshape(bh, t_q, d)
    lse_r = lse.reshape(bh, 1, t_q)
    delta_r = delta.reshape(bh, 1, t_q)
    k_len_bh = jnp.repeat(k_len.astype(jnp.int32), h)
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    bias_r = bias.reshape(bh, t_q, t_k) if bias is not None else None

    n_q, n_k = pl.cdiv(t_q, block_q), pl.cdiv(t_k, block_k)
    has_bias = bias is not None

    dq_in_specs = [
        pl.BlockSpec((1, block_q, d),
                     lambda bh, qi, ki, *_: (bh, qi, 0)),   # q
        pl.BlockSpec((1, block_k, d),
                     lambda bh, qi, ki, *_: (bh, ki, 0)),   # k
        pl.BlockSpec((1, block_k, d),
                     lambda bh, qi, ki, *_: (bh, ki, 0)),   # v
        pl.BlockSpec((1, block_q, d),
                     lambda bh, qi, ki, *_: (bh, qi, 0)),   # dO
        pl.BlockSpec((1, 1, block_q),
                     lambda bh, qi, ki, *_: (bh, 0, qi)),   # lse
        pl.BlockSpec((1, 1, block_q),
                     lambda bh, qi, ki, *_: (bh, 0, qi)),   # delta
    ]
    dq_inputs = [k_len_bh, seed_arr, q_r, k_r, v_r, do_r, lse_r, delta_r]
    dq_out_specs = pl.BlockSpec((1, block_q, d),
                                lambda bh, qi, ki, *_: (bh, qi, 0))
    dq_out_shape = jax.ShapeDtypeStruct((bh, t_q, d), q.dtype)
    if has_bias:
        dq_in_specs.append(pl.BlockSpec(
            (1, block_q, block_k), lambda bh, qi, ki, *_: (bh, qi, ki)))
        dq_inputs.append(bias_r)
        dq_out_specs = [dq_out_specs, pl.BlockSpec(
            (1, block_q, block_k), lambda bh, qi, ki, *_: (bh, qi, ki))]
        dq_out_shape = [dq_out_shape,
                        jax.ShapeDtypeStruct((bh, t_q, t_k), bias.dtype)]

    dq_res = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, has_bias=has_bias),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, n_q, n_k),
            in_specs=dq_in_specs,
            out_specs=dq_out_specs,
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=dq_out_shape,
        interpret=interpret,
    )(*dq_inputs)
    if has_bias:
        dq, dbias = dq_res
        dbias = dbias.reshape(b, h, t_q, t_k)[:, :, :t_q_orig, :t_k_orig]
    else:
        dq, dbias = dq_res, None

    kv_in_specs = [
        pl.BlockSpec((1, block_q, d),
                     lambda bh, ki, qi, *_: (bh, qi, 0)),   # q
        pl.BlockSpec((1, block_k, d),
                     lambda bh, ki, qi, *_: (bh, ki, 0)),   # k
        pl.BlockSpec((1, block_k, d),
                     lambda bh, ki, qi, *_: (bh, ki, 0)),   # v
        pl.BlockSpec((1, block_q, d),
                     lambda bh, ki, qi, *_: (bh, qi, 0)),   # dO
        pl.BlockSpec((1, 1, block_q),
                     lambda bh, ki, qi, *_: (bh, 0, qi)),   # lse
        pl.BlockSpec((1, 1, block_q),
                     lambda bh, ki, qi, *_: (bh, 0, qi)),   # delta
    ]
    kv_inputs = [k_len_bh, seed_arr, q_r, k_r, v_r, do_r, lse_r, delta_r]
    if has_bias:
        kv_in_specs.append(pl.BlockSpec(
            (1, block_q, block_k), lambda bh, ki, qi, *_: (bh, qi, ki)))
        kv_inputs.append(bias_r)

    dk, dv = pl.pallas_call(
        functools.partial(_dkdv_kernel, causal=causal, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, has_bias=has_bias),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, n_k, n_q),
            in_specs=kv_in_specs,
            out_specs=[
                pl.BlockSpec((1, block_k, d),
                             lambda bh, ki, qi, *_: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d),
                             lambda bh, ki, qi, *_: (bh, ki, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_k, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_k, d), v.dtype),
        ],
        interpret=interpret,
    )(*kv_inputs)

    dq = dq.reshape(b, h, t_q, d)[:, :, :t_q_orig, :]
    dk = dk.reshape(b, h, t_k, d)[:, :, :t_k_orig, :]
    dv = dv.reshape(b, h, t_k, d)[:, :, :t_k_orig, :]
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, k_len, seed, causal, sm_scale, dropout_rate,
           block_q, block_k, interpret):
    out, _ = _flash_fwd(q, k, v, k_len, causal=causal, sm_scale=sm_scale,
                        dropout_rate=dropout_rate, seed=seed,
                        block_q=block_q, block_k=block_k,
                        interpret=interpret)
    return out


def _flash_fwd_rule(q, k, v, k_len, seed, causal, sm_scale, dropout_rate,
                    block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, k_len, causal=causal, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, seed=seed,
                          block_q=block_q, block_k=block_k,
                          interpret=interpret)
    return out, (q, k, v, k_len, seed, out, lse)


def _flash_bwd_rule(causal, sm_scale, dropout_rate, block_q, block_k,
                    interpret, residuals, g):
    q, k, v, k_len, seed, out, lse = residuals
    dq, dk, dv, _ = _flash_bwd(
        q, k, v, k_len, out, lse, g, causal=causal, sm_scale=sm_scale,
        dropout_rate=dropout_rate, seed=seed,
        block_q=block_q, block_k=block_k, interpret=interpret)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_b(q, k, v, bias, k_len, seed, causal, sm_scale, dropout_rate,
             block_q, block_k, interpret):
    out, _ = _flash_fwd(q, k, v, k_len, causal=causal, sm_scale=sm_scale,
                        dropout_rate=dropout_rate, seed=seed,
                        block_q=block_q, block_k=block_k,
                        interpret=interpret, bias=bias)
    return out


def _flash_b_fwd_rule(q, k, v, bias, k_len, seed, causal, sm_scale,
                      dropout_rate, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, k_len, causal=causal, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, seed=seed,
                          block_q=block_q, block_k=block_k,
                          interpret=interpret, bias=bias)
    return out, (q, k, v, bias, k_len, seed, out, lse)


def _flash_b_bwd_rule(causal, sm_scale, dropout_rate, block_q, block_k,
                      interpret, residuals, g):
    q, k, v, bias, k_len, seed, out, lse = residuals
    dq, dk, dv, dbias = _flash_bwd(
        q, k, v, k_len, out, lse, g, causal=causal, sm_scale=sm_scale,
        dropout_rate=dropout_rate, seed=seed,
        block_q=block_q, block_k=block_k, interpret=interpret, bias=bias)
    return dq, dk, dv, dbias.astype(bias.dtype), None, None


_flash_b.defvjp(_flash_b_fwd_rule, _flash_b_bwd_rule)


def flash_attention(q, k, v, k_len, *, causal=False, sm_scale=None,
                    dropout_rate=0.0, dropout_seed=None,
                    block_q=None, block_k=None,
                    interpret=False):
    """softmax(QK^T * sm_scale, masked)V without materializing scores.

    Args:
      q: (B, H, T_q, d); k, v: (B, H, T_k, d).
      k_len: (B,) int32 — number of valid key positions per batch row.
      causal: lower-triangular masking (query i attends keys <= i).
      sm_scale: logit scale; default 1/sqrt(d) (reference modules.py:9).
      dropout_rate: attention-prob dropout (modules.py:18-19), applied
        in-kernel; the keep mask is regenerated (not stored) in the
        backward kernels.
      dropout_seed: scalar int array (or Python int) seeding the
        in-kernel PRNG — vary per step/layer for fresh masks.
    Returns (B, H, T_q, d) in q.dtype.
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    # mask-aware default blocks (r5 on-chip causal sweep, fwd+bwd
    # dropout 0.1 at B32 H4 T1024 d96, scripts/flash_ab.py cblocks):
    # causal (512,512) 2.38 ms vs the old global (256,1024) default's
    # 4.86 — under the causal runtime block-skip (pl.when) the square
    # block wins; non-causal keeps the r2 full-row-k result
    # ((256,1024) 3.51 vs (256,512) 4.21: one softmax pass, no
    # running-max rescale traffic).
    if block_q is None:
        block_q = min(512 if causal else DEFAULT_BLOCK_Q, q.shape[2])
    if block_k is None:
        block_k = min(512 if causal else DEFAULT_BLOCK_K, k.shape[2])
    return _flash(q, k, v, k_len, jnp.asarray(dropout_seed, jnp.int32),
                  causal, float(sm_scale), float(dropout_rate),
                  int(block_q), int(block_k), bool(interpret))


def flash_attention_with_bias(q, k, v, bias, k_len, *, sm_scale=None,
                              dropout_rate=0.0, dropout_seed=None,
                              block_q=DEFAULT_BLOCK_Q,
                              block_k=DEFAULT_BLOCK_K, interpret=False):
    """softmax((QK^T + bias) * sm_scale, masked)V, bias-differentiable.

    The relative-attention core (ops/attention.RelativeMultiHeadAttention
    flash path): ``bias`` is the (B, H, T_q, T_k) additive logits term
    (the rel-shifted position scores), added BEFORE the sm_scale exactly
    like the reference's (ac + bd) / sqrt(d_k) (Models/modules.py:254).
    The backward emits dbias (= the pre-scale logit gradient), so the
    position projections upstream of the bias get exact gradients via
    XLA autodiff. Masked keys are excluded exactly (vs the reference's
    -2^15 fill); in-kernel prob dropout as in :func:`flash_attention`.
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)
    return _flash_b(q, k, v, bias, k_len,
                    jnp.asarray(dropout_seed, jnp.int32),
                    False, float(sm_scale), float(dropout_rate),
                    int(block_q), int(block_k), bool(interpret))


def reference_attention(q, k, v, k_len, causal=False, sm_scale=None):
    """jnp oracle with the same masking semantics (for tests/A-B).

    Matches the flash matmul precision: bf16 MXU with fp32 accumulation,
    probs cast to the value dtype for the PV matmul (exactly what
    ops/attention.scaled_dot_attention does).
    """
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    t_q, t_k = q.shape[2], k.shape[2]
    mask = jnp.arange(t_k)[None, :] < k_len[:, None]
    mask = mask[:, None, None, :]
    if causal:
        cmask = (jnp.arange(t_q)[:, None] >= jnp.arange(t_k)[None, :])
        mask = mask & cmask[None, None]
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask.any(-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
