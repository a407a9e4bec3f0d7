"""Flash attention with IN-KERNEL Transformer-XL relative-position bias.

The conformer's RelativeMultiHeadAttention (Models/modules.py:201-283)
scores are ``(q_u K^T + rel_shift(q_v P^T)) / sqrt(d_k)``. Round 2
streamed the second term into the flash kernel as a precomputed
(B, H, T, T) additive-bias input — correct, but the bias (and its
gradient) round-tripped HBM every step and XLA materialized the fp32
einsum + pad/reshape rel_shift temporaries on top (the conformer family
trained 2.2x slower than the plain transformer). Here the bias never
exists outside VMEM:

* Each (q-block, k-block) tile of ``rel_shift(q_v P^T)`` only needs P at
  a CONTIGUOUS range of positions. With the reference's rel_shift
  semantics (pad-reshape trick over a 0..T-1 sinusoid table,
  ops/attention.rel_shift), the tile decomposes exactly as

      bd[i, j] = q_v[i]  . P[T-1-(i-j)]          for j <= i   (past)
               = 0                               for j == i+1
               = q_v[i+1]. P[(j-i)-2]            for j >= i+2 (wrapped
                 "future" values — the table has no future offsets, so
                 the reference reads the NEXT row's dot products; this
                 quirk is load-bearing for parity and is reproduced
                 bit-exactly)

  Both branches read a (block_q + block_k)-wide slice of P, so the
  kernel loads P once per head (a few hundred KB in VMEM), takes two
  dynamic slices, runs two small MXU matmuls, and realigns the
  diagonals with a SINGLE strided ``pltpu.roll`` per branch (row i
  rolled by i — the hardware dynamic-rotate with a per-sublane stride).

* The backward recomputes the same tiles; dS scatters back through the
  inverse strided roll into dq_v / d(shifted q_v) accumulators and into
  a full-length dP accumulator held in VMEM scratch, so the gradient
  path is also free of (B, H, T, T) HBM tensors.

Masking: per-batch prefix key length (k_len), exact exclusion (vs the
reference's -2^15 fill — same delta as ops/flash_attention). In-kernel
counter-hash attention-prob dropout identical to flash_attention (the
keep mask is regenerated, never stored). Self-attention only
(t_q == t_k == len(P)), non-causal — exactly the conformer's use.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_tts_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, NEG_INF, _keep_mask)


# The per-row diagonal realignment uses the hardware strided
# dynamic-rotate (tpu.dynamic_rotate: row i rolls by shift + stride*i),
# whose max total shift must stay under the 128-lane vreg width — hence
# MAX_BLOCK_Q rows per tile, shift 0, stride 1 (shifts 0..127).
MAX_BLOCK_Q = 128


def _flip_rows(x: jnp.ndarray, out_dtype=jnp.float32) -> jnp.ndarray:
    """Reverse the sublane (row) order via an anti-diagonal permutation
    matmul — `lax.rev` has no Mosaic lowering, the MXU is idle anyway,
    and a permutation matmul is exact in any dtype."""
    n = x.shape[0]
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    r = (i + j == n - 1).astype(x.dtype)
    return jax.lax.dot_general(r, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(out_dtype)


def _extract_diag(a: jnp.ndarray, base: int) -> jnp.ndarray:
    """C[i, j] = a[i, (j + base - i) mod W] — one uniform roll + one
    strided dynamic-rotate (row i right-rolled by i)."""
    w = a.shape[1]
    y = pltpu.roll(a, (w - base % w) % w, 1)   # left-roll by base
    return pltpu.roll(y, 0, 1, stride=1, stride_axis=0)


def _scatter_w(ds_masked: jnp.ndarray, base: int, wp: int) -> jnp.ndarray:
    """Row-FLIPPED inverse of :func:`_extract_diag`.

    Returns W with ``R @ W == D`` where D[i, c] = ds_pad[i, (c - base +
    i) mod wp] is the true scatter and R the row-reversal. The strided
    rotate only shifts by +i per row, so -i is obtained by conjugating
    with R; the OUTER flip is left to the consumers, which fold it into
    their (narrow) matmuls instead of permuting this wide matrix:
    ``D @ p == R @ (W @ p)`` and ``D^T @ q == W^T @ (R @ q)``.
    """
    n = ds_masked.shape[0]
    x = jnp.pad(ds_masked, ((0, 0), (0, wp - ds_masked.shape[1])))
    # flip on the MXU in the narrow dtype, but ROLL in fp32: the
    # hardware dynamic-rotate only handles 32-bit element types
    f = _flip_rows(x, out_dtype=jnp.float32)   # R @ pad(ds)
    g = pltpu.roll(f, 0, 1, stride=1, stride_axis=0)
    # U commutes with R (lanes vs rows): apply it here, flip later
    return pltpu.roll(g, (base - n + 1) % wp, 1).astype(ds_masked.dtype)


def _slice_geometry(block_q, block_k, seq_len, t_q_pad):
    """Static geometry of the two P slices.

    Mosaic requires dynamic sublane slice starts to be PROVABLY multiples
    of 8: the starts are built as (static 8-aligned base) + k0 - q0 - bq
    (all three multiples of 8); the past base's sub-8 remainder ``r1``
    folds into the diagonal-roll base instead. The future base
    (t_q_pad, a block multiple) is aligned by construction.

    Returns (wp, past_base, r1, fut_base): slice width, static aligned
    bases (tile start = base + k0 - q0 - block_q), and the past
    extraction-offset remainder.
    """
    # +128 keeps the lane (minor) dim a multiple of 128 when the blocks
    # are — misaligned lane widths force Mosaic relayouts on every roll —
    # and absorbs the r1 < 8 alignment remainder
    wp = block_q + block_k + 128
    raw_past = t_q_pad + 1 + seq_len    # p_big row of P[T-1] + 1
    past_base = (raw_past // 8) * 8
    r1 = raw_past - past_base
    fut_base = t_q_pad                  # multiple of 8 (block-padded)
    return wp, past_base, r1, fut_base


def _bd_tile(qv, qvs, p_ref, q0, k0, *, block_q, block_k, seq_len,
             t_q_pad):
    """The (block_q, block_k) tile of rel_shift(q_v P^T), fp32.

    ``p_ref``: (1, Lp, d) VMEM ref of the zero-padded position table with
    P[g] at row t_q_pad + 1 + g. Returns (bd, p1, p2) — the slices are
    reused by the backward kernels.
    """
    wp, past_base, r1, fut_base = _slice_geometry(
        block_q, block_k, seq_len, t_q_pad)
    # every term is a multiple of 8 (static bases aligned; k0/q0/block_q
    # are block multiples) — annotate for Mosaic's alignment checker
    s1 = pl.multiple_of(past_base + k0 - q0 - block_q, 8)
    s2 = pl.multiple_of(fut_base + k0 - q0 - block_q, 8)
    p1 = p_ref[0, pl.ds(s1, wp), :]                    # (wp, d)
    p2 = p_ref[0, pl.ds(s2, wp), :]
    a1 = jax.lax.dot_general(qv, p1, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a2 = jax.lax.dot_general(qvs, p2, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    c1 = _extract_diag(a1, block_q - 1 + r1)[:, :block_k]
    c2 = _extract_diag(a2, block_q - 1)[:, :block_k]
    row = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    bd = jnp.where(col <= row, c1,
                   jnp.where(col == row + 1, 0.0, c2))
    return bd, p1, p2


def _split_ds(ds, q0, k0, block_q, block_k, seq_len, t_q_pad,
              mxu_dtype):
    """Split dS into past/future ROW-FLIPPED scatter layouts (W1, W2;
    see :func:`_scatter_w`), cast to the MXU dtype — the scatters only
    feed matmuls whose operands are that dtype anyway."""
    row = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    wp, _, r1, _ = _slice_geometry(block_q, block_k, seq_len, t_q_pad)
    ds1 = jnp.where(col <= row, ds, 0.0).astype(mxu_dtype)
    ds2 = jnp.where(col >= row + 2, ds, 0.0).astype(mxu_dtype)
    w1 = _scatter_w(ds1, block_q - 1 + r1, wp)         # (bq, wp)
    w2 = _scatter_w(ds2, block_q - 1, wp)
    return w1, w2


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref, qvs_ref,
                p_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                sm_scale: float, dropout_rate: float, seq_len: int,
                t_q_pad: int):
    """Grid: (B*H, num_q_blocks, num_k_blocks) — k innermost."""
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
    q0 = qi * block_q
    k0 = ki * block_k

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bd, _, _ = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                        block_q=block_q, block_k=block_k,
                        seq_len=seq_len, t_q_pad=t_q_pad)
    s = (s + bd) * sm_scale

    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < k_len
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = alpha * l_ref[:] + jnp.sum(p, axis=1, keepdims=True)
    if dropout_rate > 0.0:
        p = p * _keep_mask(seed_ref[0], bh, q0, k0,
                           (block_q, block_k), dropout_rate)
    acc_ref[:] = alpha * acc_ref[:] + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_ref[:]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_ref[:] + jnp.log(safe_l))[:, 0]


def _relpos_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed, *, seq_len,
                sm_scale, dropout_rate, block_q, block_k, interpret):
    b, h, t_q, d = q_u.shape
    t_k = k.shape[2]
    lp = p_big.shape[1]
    bh = b * h
    q_r = q_u.reshape(bh, t_q, d)
    qv_r = q_v.reshape(bh, t_q, d)
    qvs_r = q_vs.reshape(bh, t_q, d)
    k_r = k.reshape(bh, t_k, d)
    v_r = v.reshape(bh, t_k, d)
    k_len_bh = jnp.repeat(k_len.astype(jnp.int32), h)
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)

    grid = (bh, t_q // block_q, t_k // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, seq_len=seq_len,
                          t_q_pad=t_q),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d),
                             lambda bh, qi, ki, *_: (bh, qi, 0)),   # q_u
                pl.BlockSpec((1, block_k, d),
                             lambda bh, qi, ki, *_: (bh, ki, 0)),   # k
                pl.BlockSpec((1, block_k, d),
                             lambda bh, qi, ki, *_: (bh, ki, 0)),   # v
                pl.BlockSpec((1, block_q, d),
                             lambda bh, qi, ki, *_: (bh, qi, 0)),   # q_v
                pl.BlockSpec((1, block_q, d),
                             lambda bh, qi, ki, *_: (bh, qi, 0)),   # q_vs
                pl.BlockSpec((1, lp, d),
                             lambda bh, qi, ki, *_, _h=h:
                             (jax.lax.rem(bh, _h), 0, 0)),          # p
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d),
                             lambda bh, qi, ki, *_: (bh, qi, 0)),
                pl.BlockSpec((1, 1, block_q),
                             lambda bh, qi, ki, *_: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_q, d), q_u.dtype),
            jax.ShapeDtypeStruct((bh, 1, t_q), jnp.float32),
        ],
        interpret=interpret,
    )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big)
    return out.reshape(b, h, t_q, d), lse.reshape(b, h, t_q)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref, qvs_ref,
               p_ref, do_ref, lse_ref, delta_ref,
               dq_out_ref, dqv_out_ref, dqvs_out_ref,
               dq_acc_ref, dqv_acc_ref, dqvs_acc_ref, *,
               sm_scale: float, dropout_rate: float, seq_len: int,
               t_q_pad: int):
    """Grid: (B*H, num_q_blocks, num_k_blocks) — accumulate over k."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    n_k = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)
        dqv_acc_ref[:] = jnp.zeros_like(dqv_acc_ref)
        dqvs_acc_ref[:] = jnp.zeros_like(dqvs_acc_ref)

    k_len = k_len_ref[bh]
    q0 = qi * block_q
    k0 = ki * block_k

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bd, p1, p2 = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                          block_q=block_q, block_k=block_k,
                          seq_len=seq_len, t_q_pad=t_q_pad)
    s = (s + bd) * sm_scale
    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < k_len
    lse = lse_ref[0, 0][:, None]
    prob = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = dp * _keep_mask(seed_ref[0], bh, q0, k0,
                             (block_q, block_k), dropout_rate)
    ds = prob * (dp - delta_ref[0, 0][:, None]) * sm_scale   # (bq, bk)

    dq_acc_ref[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    w1, w2 = _split_ds(ds, q0, k0, block_q, block_k, seq_len, t_q_pad,
                       p1.dtype)
    # D @ p == R @ (W @ p): flip the NARROW product, not the wide W
    dqv_acc_ref[:] += _flip_rows(jax.lax.dot_general(
        w1, p1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dqvs_acc_ref[:] += _flip_rows(jax.lax.dot_general(
        w2, p2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_out_ref[0] = dq_acc_ref[:].astype(dq_out_ref.dtype)
        dqv_out_ref[0] = dqv_acc_ref[:].astype(dqv_out_ref.dtype)
        dqvs_out_ref[0] = dqvs_acc_ref[:].astype(dqvs_out_ref.dtype)


def _dkdv_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref,
                 qvs_ref, p_ref, do_ref, lse_ref, delta_ref,
                 dk_out_ref, dv_out_ref, dp_out_ref,
                 dk_acc_ref, dv_acc_ref, dp_acc_ref, *,
                 sm_scale: float, dropout_rate: float, seq_len: int,
                 t_q_pad: int):
    """Grid: (B*H, num_k_blocks, num_q_blocks), BOTH trailing dims
    sequential — dk/dv accumulate over q per k-block, and the full-length
    dP accumulator in VMEM scratch integrates over every (ki, qi) tile of
    one (b, h), dumped at the last step."""
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    n_k = pl.num_programs(1)
    n_q = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]
    wp = _slice_geometry(block_q, block_k, seq_len, t_q_pad)[0]

    @pl.when(qi == 0)
    def _init_kv():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    @pl.when((ki == 0) & (qi == 0))
    def _init_dp():
        dp_acc_ref[:] = jnp.zeros_like(dp_acc_ref)

    k_len = k_len_ref[bh]
    q0 = qi * block_q
    k0 = ki * block_k

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bd, _, _ = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                        block_q=block_q, block_k=block_k,
                        seq_len=seq_len, t_q_pad=t_q_pad)
    s = (s + bd) * sm_scale
    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < k_len
    lse = lse_ref[0, 0][:, None]
    prob = jnp.where(mask, jnp.exp(s - lse), 0.0)
    keep = None
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref[0], bh, q0, k0,
                          (block_q, block_k), dropout_rate)
    p_dropped = prob * keep if keep is not None else prob
    dv_acc_ref[:] += jax.lax.dot_general(
        p_dropped.astype(do_ref.dtype), do_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if keep is not None:
        dp = dp * keep
    ds = prob * (dp - delta_ref[0, 0][:, None]) * sm_scale   # (bq, bk)
    dk_acc_ref[:] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # dP: scatter dS back through the diagonal layout into the full
    # accumulator (the two slices overlap across tiles — VMEM RMW)
    w1, w2 = _split_ds(ds, q0, k0, block_q, block_k, seq_len, t_q_pad,
                       qv_ref.dtype)
    _, past_base, _, fut_base = _slice_geometry(
        block_q, block_k, seq_len, t_q_pad)
    s1 = pl.multiple_of(past_base + k0 - q0 - block_q, 8)
    s2 = pl.multiple_of(fut_base + k0 - q0 - block_q, 8)
    # D^T @ q == W^T @ (R @ q): flip the NARROW q tile, not W
    qv_f = _flip_rows(qv_ref[0], out_dtype=qv_ref.dtype)
    qvs_f = _flip_rows(qvs_ref[0], out_dtype=qvs_ref.dtype)
    c1 = jax.lax.dot_general(
        w1, qv_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (wp, d)
    c2 = jax.lax.dot_general(
        w2, qvs_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_acc_ref[pl.ds(s1, wp), :] += c1
    dp_acc_ref[pl.ds(s2, wp), :] += c2

    @pl.when(qi == n_q - 1)
    def _finalize_kv():
        dk_out_ref[0] = dk_acc_ref[:].astype(dk_out_ref.dtype)
        dv_out_ref[0] = dv_acc_ref[:].astype(dv_out_ref.dtype)

    @pl.when((ki == n_k - 1) & (qi == n_q - 1))
    def _finalize_dp():
        dp_out_ref[0] = dp_acc_ref[:].astype(dp_out_ref.dtype)


def _fused_bwd_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref,
                      qvs_ref, p_ref, do_ref, lse_ref, delta_ref,
                      dq_out_ref, dqv_out_ref, dqvs_out_ref,
                      dk_out_ref, dv_out_ref, dp_out_ref,
                      dk_acc_ref, dv_acc_ref, dp_acc_ref, *,
                      sm_scale: float, dropout_rate: float, seq_len: int,
                      t_q_pad: int):
    """Single-k-block FUSED backward. Grid: (B*H, num_q_blocks), qi
    sequential. With K/V resident as full blocks, the expensive tile
    recompute (scores, in-kernel bias + its 4 diagonal rolls, probs, dS
    + its 2 scatter rolls) happens ONCE per q tile instead of once in
    each of the dq and dk/dv kernels — the rolls are the backward's
    dominant VPU cost. dq/dq_v/dq_vs fall out per tile (no k
    accumulation needed); dk/dv/dP accumulate in VMEM scratch and dump
    at the last q block."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    n_q = pl.num_programs(1)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]          # == full t_k
    wp = _slice_geometry(block_q, block_k, seq_len, t_q_pad)[0]

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)
        dp_acc_ref[:] = jnp.zeros_like(dp_acc_ref)

    k_len = k_len_ref[bh]
    q0 = qi * block_q
    k0 = jnp.int32(0)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bd, p1, p2 = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                          block_q=block_q, block_k=block_k,
                          seq_len=seq_len, t_q_pad=t_q_pad)
    s = (s + bd) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = col < k_len
    lse = lse_ref[0, 0][:, None]
    prob = jnp.where(mask, jnp.exp(s - lse), 0.0)
    keep = None
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref[0], bh, q0, k0,
                          (block_q, block_k), dropout_rate)
    p_dropped = prob * keep if keep is not None else prob
    dv_acc_ref[:] += jax.lax.dot_general(
        p_dropped.astype(do_ref.dtype), do_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if keep is not None:
        dp = dp * keep
    ds = prob * (dp - delta_ref[0, 0][:, None]) * sm_scale

    dq_out_ref[0] = jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_out_ref.dtype)
    dk_acc_ref[:] += jax.lax.dot_general(
        ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    w1, w2 = _split_ds(ds, q0, k0, block_q, block_k, seq_len, t_q_pad,
                       p1.dtype)
    dq_v = _flip_rows(jax.lax.dot_general(
        w1, p1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dq_vs = _flip_rows(jax.lax.dot_general(
        w2, p2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dqv_out_ref[0] = dq_v.astype(dqv_out_ref.dtype)
    dqvs_out_ref[0] = dq_vs.astype(dqvs_out_ref.dtype)

    _, past_base, _, fut_base = _slice_geometry(
        block_q, block_k, seq_len, t_q_pad)
    s1 = pl.multiple_of(past_base + k0 - q0 - block_q, 8)
    s2 = pl.multiple_of(fut_base + k0 - q0 - block_q, 8)
    qv_f = _flip_rows(qv_ref[0], out_dtype=qv_ref.dtype)
    qvs_f = _flip_rows(qvs_ref[0], out_dtype=qvs_ref.dtype)
    dp_acc_ref[pl.ds(s1, wp), :] += jax.lax.dot_general(
        w1, qv_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_acc_ref[pl.ds(s2, wp), :] += jax.lax.dot_general(
        w2, qvs_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_out_ref[0] = dk_acc_ref[:].astype(dk_out_ref.dtype)
        dv_out_ref[0] = dv_acc_ref[:].astype(dv_out_ref.dtype)
        dp_out_ref[0] = dp_acc_ref[:].astype(dp_out_ref.dtype)


def _relpos_bwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse, g, *,
                seq_len, sm_scale, dropout_rate, block_q, block_k,
                interpret):
    b, h, t_q, d = q_u.shape
    t_k = k.shape[2]
    lp = p_big.shape[1]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)                             # (b, h, t_q)

    bh = b * h
    q_r = q_u.reshape(bh, t_q, d)
    qv_r = q_v.reshape(bh, t_q, d)
    qvs_r = q_vs.reshape(bh, t_q, d)
    k_r = k.reshape(bh, t_k, d)
    v_r = v.reshape(bh, t_k, d)
    do_r = g.reshape(bh, t_q, d)
    lse_r = lse.reshape(bh, 1, t_q)
    delta_r = delta.reshape(bh, 1, t_q)
    k_len_bh = jnp.repeat(k_len.astype(jnp.int32), h)
    seed_arr = jnp.reshape(seed, (1,)).astype(jnp.int32)
    n_q, n_k = t_q // block_q, t_k // block_k

    common = dict(sm_scale=sm_scale, dropout_rate=dropout_rate,
                  seq_len=seq_len, t_q_pad=t_q)

    if n_k == 1:
        # fused single-pass backward (the default full-row-K case)
        fq = pl.BlockSpec((1, block_q, d),
                          lambda bh, qi, *_: (bh, qi, 0))
        fk = pl.BlockSpec((1, block_k, d),
                          lambda bh, qi, *_: (bh, 0, 0))
        frow = pl.BlockSpec((1, 1, block_q),
                            lambda bh, qi, *_: (bh, 0, qi))
        fp = pl.BlockSpec((1, lp, d),
                          lambda bh, qi, *_, _h=h:
                          (jax.lax.rem(bh, _h), 0, 0))
        full = pl.BlockSpec((1, block_k, d), lambda bh, qi, *_: (bh, 0, 0))
        dq, dqv, dqvs, dk, dv, dp_big = pl.pallas_call(
            functools.partial(_fused_bwd_kernel, **common),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(bh, n_q),
                in_specs=[fq, fk, fk, fq, fq, fp, fq, frow, frow],
                out_specs=[
                    fq, fq, fq, full, full,
                    pl.BlockSpec((1, lp, d), lambda bh, qi, *_: (bh, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((lp, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, t_q, d), q_u.dtype),
                jax.ShapeDtypeStruct((bh, t_q, d), q_v.dtype),
                jax.ShapeDtypeStruct((bh, t_q, d), q_vs.dtype),
                jax.ShapeDtypeStruct((bh, t_k, d), k.dtype),
                jax.ShapeDtypeStruct((bh, t_k, d), v.dtype),
                jax.ShapeDtypeStruct((bh, lp, d), jnp.float32),
            ],
            interpret=interpret,
        )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big, do_r,
          lse_r, delta_r)
        dq = dq.reshape(b, h, t_q, d)
        dqv = dqv.reshape(b, h, t_q, d)
        dqvs = dqvs.reshape(b, h, t_q, d)
        dk = dk.reshape(b, h, t_k, d)
        dv = dv.reshape(b, h, t_k, d)
        dp_big = dp_big.reshape(b, h, lp, d).sum(axis=0).astype(
            p_big.dtype)
        return dq, dqv, dqvs, dk, dv, dp_big

    q_spec = pl.BlockSpec((1, block_q, d),
                          lambda bh, qi, ki, *_: (bh, qi, 0))
    k_spec = pl.BlockSpec((1, block_k, d),
                          lambda bh, qi, ki, *_: (bh, ki, 0))
    row_spec = pl.BlockSpec((1, 1, block_q),
                            lambda bh, qi, ki, *_: (bh, 0, qi))
    p_spec = pl.BlockSpec((1, lp, d),
                          lambda bh, qi, ki, *_, _h=h:
                          (jax.lax.rem(bh, _h), 0, 0))

    dq, dqv, dqvs = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, n_q, n_k),
            in_specs=[q_spec, k_spec, k_spec, q_spec, q_spec, p_spec,
                      q_spec, row_spec, row_spec],
            out_specs=[q_spec, q_spec, q_spec],
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, t_q, d), q_u.dtype)] * 3,
        interpret=interpret,
    )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big, do_r,
      lse_r, delta_r)

    # dkdv grid: (bh, ki, qi) — index maps swap the roles
    q_spec2 = pl.BlockSpec((1, block_q, d),
                           lambda bh, ki, qi, *_: (bh, qi, 0))
    k_spec2 = pl.BlockSpec((1, block_k, d),
                           lambda bh, ki, qi, *_: (bh, ki, 0))
    row_spec2 = pl.BlockSpec((1, 1, block_q),
                             lambda bh, ki, qi, *_: (bh, 0, qi))
    p_spec2 = pl.BlockSpec((1, lp, d),
                           lambda bh, ki, qi, *_, _h=h:
                           (jax.lax.rem(bh, _h), 0, 0))
    dk, dv, dp_big = pl.pallas_call(
        functools.partial(_dkdv_kernel, **common),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, n_k, n_q),
            in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, q_spec2,
                      p_spec2, q_spec2, row_spec2, row_spec2],
            out_specs=[
                k_spec2, k_spec2,
                pl.BlockSpec((1, lp, d), lambda bh, ki, qi, *_: (bh, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((lp, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_k, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_k, d), v.dtype),
            jax.ShapeDtypeStruct((bh, lp, d), jnp.float32),
        ],
        interpret=interpret,
    )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big, do_r,
      lse_r, delta_r)

    dq = dq.reshape(b, h, t_q, d)
    dqv = dqv.reshape(b, h, t_q, d)
    dqvs = dqvs.reshape(b, h, t_q, d)
    dk = dk.reshape(b, h, t_k, d)
    dv = dv.reshape(b, h, t_k, d)
    # dP is shared across the batch: reduce the per-(b,h) contributions
    dp_big = dp_big.reshape(b, h, lp, d).sum(axis=0).astype(p_big.dtype)
    return dq, dqv, dqvs, dk, dv, dp_big


# ---------------------------------------------------------------------------
# custom_vjp core (pre-padded inputs) + public wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _flash_rp(q_u, q_v, q_vs, k, v, p_big, k_len, seed, seq_len,
              sm_scale, dropout_rate, block_q, block_k, interpret):
    out, _ = _relpos_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed,
                         seq_len=seq_len, sm_scale=sm_scale,
                         dropout_rate=dropout_rate, block_q=block_q,
                         block_k=block_k, interpret=interpret)
    return out


def _flash_rp_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed, seq_len,
                  sm_scale, dropout_rate, block_q, block_k, interpret):
    out, lse = _relpos_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed,
                           seq_len=seq_len, sm_scale=sm_scale,
                           dropout_rate=dropout_rate, block_q=block_q,
                           block_k=block_k, interpret=interpret)
    return out, (q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse)


def _flash_rp_bwd(seq_len, sm_scale, dropout_rate, block_q, block_k,
                  interpret, residuals, g):
    q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse = residuals
    dq, dqv, dqvs, dk, dv, dp_big = _relpos_bwd(
        q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse, g,
        seq_len=seq_len, sm_scale=sm_scale, dropout_rate=dropout_rate,
        block_q=block_q, block_k=block_k, interpret=interpret)
    return dq, dqv, dqvs, dk, dv, dp_big, None, None


_flash_rp.defvjp(_flash_rp_fwd, _flash_rp_bwd)


def flash_relpos_attention(q_u, q_v, k, v, p, k_len, *, sm_scale=None,
                           dropout_rate=0.0, dropout_seed=None,
                           block_q=DEFAULT_BLOCK_Q,
                           block_k=DEFAULT_BLOCK_K, interpret=False):
    """softmax((q_u K^T + rel_shift(q_v P^T)) * sm_scale, prefix-masked)V.

    Args:
      q_u: (B, H, T, d) — query + pos_bias_u (the content term's query).
      q_v: (B, H, T, d) — query + pos_bias_v (the position term's query).
      k, v: (B, H, T, d); self-attention only (t_q == t_k == len(P)).
      p: (H, T, d) or (1, H, T, d) — projected relative position table
         (shared across the batch; its gradient is batch-summed).
      k_len: (B,) int32 valid key lengths (contiguous prefix mask).
      dropout_rate/dropout_seed: in-kernel attention-prob dropout,
        identical stream to ops/flash_attention.
    Returns (B, H, T, d) in q_u.dtype. Differentiable in q_u, q_v, k, v
    and p (exact gradients — the backward never materializes (B,H,T,T)).
    """
    if p.ndim == 4:
        if p.shape[0] != 1:
            raise ValueError("p must be batch-1 (shared position table)")
        p = p[0]
    b, h, t, d = q_u.shape
    if k.shape != q_u.shape or v.shape != q_u.shape \
            or q_v.shape != q_u.shape:
        raise ValueError("flash_relpos_attention is self-attention only")
    if p.shape != (h, t, d):
        raise ValueError(f"p shape {p.shape} != {(h, t, d)}")
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    if dropout_seed is None:
        dropout_seed = jnp.zeros((), jnp.int32)

    t8 = -(-t // 8) * 8          # blocks stay multiples of 8 (Mosaic
    # q blocks cap at MAX_BLOCK_Q: the strided dynamic-rotate's shifts
    # (0..block_q-1) must fit one vreg width
    block_q = min(block_q, MAX_BLOCK_Q, max(t8, 8))
    block_k = min(block_k, max(t8, 8))
    t_q_pad = -(-t // block_q) * block_q
    t_k_pad = -(-t // block_k) * block_k
    # the shifted copy reads q_v[i+1]; row t-1 reads the zero pad (its
    # only consumers are masked positions)
    q_vs = jnp.pad(q_v[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    qpad = ((0, 0), (0, 0), (0, t_q_pad - t), (0, 0))
    kpad = ((0, 0), (0, 0), (0, t_k_pad - t), (0, 0))
    q_u_p = jnp.pad(q_u, qpad)
    q_v_p = jnp.pad(q_v, qpad)
    q_vs_p = jnp.pad(q_vs, qpad)
    k_p = jnp.pad(k, kpad)
    v_p = jnp.pad(v, kpad)
    # P[g] lives at p_big row t_q_pad + 1 + g (the +1 absorbs the
    # future-slice base index; see _bd_tile); zero rows elsewhere are
    # read only at masked positions. Tail slack covers the widest
    # aligned past slice (wp includes +8 alignment headroom).
    lp = -(-(t_q_pad + 2 * t_k_pad + 144) // 8) * 8
    p_big = jnp.pad(
        p, ((0, 0), (t_q_pad + 1, lp - (t_q_pad + 1) - t), (0, 0)))

    out = _flash_rp(q_u_p, q_v_p, q_vs_p, k_p, v_p, p_big, k_len,
                    jnp.asarray(dropout_seed, jnp.int32), t,
                    float(sm_scale), float(dropout_rate), int(block_q),
                    int(block_k), bool(interpret))
    return out[:, :, :t, :]


def reference_relpos_attention(q_u, q_v, k, v, p, k_len, sm_scale=None):
    """jnp oracle with identical semantics (tests / A-B): full (ac+bd)
    logits with the reference rel_shift, exact prefix-mask exclusion."""
    from transformer_tts_tpu.ops.attention import rel_shift
    if p.ndim == 3:
        p = p[None]
    d = q_u.shape[-1]
    if sm_scale is None:
        sm_scale = 1.0 / (d ** 0.5)
    ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("bhqd,bhkd->bhqk", q_v,
                    jnp.broadcast_to(p, q_v.shape),
                    preferred_element_type=jnp.float32)
    s = (ac + rel_shift(bd)) * sm_scale
    t_k = k.shape[2]
    mask = (jnp.arange(t_k)[None, :] < k_len[:, None])[:, None, None, :]
    s = jnp.where(mask, s, NEG_INF)
    prob = jax.nn.softmax(s, axis=-1)
    prob = jnp.where(mask.any(-1, keepdims=True), prob, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", prob.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q_u.dtype)
