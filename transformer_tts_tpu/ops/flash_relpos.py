"""Flash attention with IN-KERNEL Transformer-XL relative-position bias.

The conformer's RelativeMultiHeadAttention (Models/modules.py:201-283)
scores are ``(q_u K^T + rel_shift(q_v P^T)) / sqrt(d_k)``. Round 2
streamed the second term into the flash kernel as a precomputed
(B, H, T, T) additive-bias input — correct, but the bias (and its
gradient) round-tripped HBM every step. Round 3 moved the bias math
in-kernel; this revision removes the remaining realignment overhead
(measured ~0.9 ms/layer of uniform lane-rolls + oversized flip
matmuls at the production shape). The bias never exists outside VMEM:

* Each (q-block, k-block) tile of ``rel_shift(q_v P^T)`` only needs P
  at a CONTIGUOUS range of positions. With the reference's rel_shift
  semantics (pad-reshape trick over a 0..T-1 sinusoid table,
  ops/attention.rel_shift), the tile decomposes exactly as

      bd[i, j] = q_v[i]  . P[T-1-(i-j)]          for j <= i   (past)
               = 0                               for j == i+1
               = q_v[i+1]. P[(j-i)-2]            for j >= i+2 (wrapped
                 "future" values — the table has no future offsets, so
                 the reference reads the NEXT row's dot products; this
                 quirk is load-bearing for parity and is reproduced
                 bit-exactly)

  Both branches are ``q . P[K + (col - row)]`` for a per-branch
  constant K, i.e. ONE (block_q, d) x (d, wp) MXU matmul against a
  contiguous P slice, then a SINGLE hardware strided dynamic-rotate
  (row r right-rolled by r) and a vreg-aligned static lane slice.
  There are NO uniform lane-rolls: the slice is taken with a LEAD of
  128 lanes so the rotate never wraps, and every slice start is
  ``copy_origin + (t_q_pad - block_q) + k0 - q0`` — provably a
  multiple of 8 — because each P COPY in the padded table places the
  row data at whatever integer offset makes that true (the residues
  that round 3 paid rolls for are absorbed into table placement).

* The backward recomputes the same tiles; dS scatters back through the
  inverse strided roll (conjugated with a row-reversal that is done on
  the NARROW (bq, bk) matrix before padding) into dq_v accumulators
  and a full-length dP accumulator held in VMEM scratch. The inverse
  direction lands the scatter one lane off the forward window
  (delta = 129 - block_q), so the backward consumers read their own
  P copies, placed one row offset over — four copies total
  (past/future x extract/consumer), each a few hundred KB. dP is
  accumulated ACROSS THE BATCH in-kernel (the grid is head-outermost,
  batch sequential), so the dP HBM round trip is (H, Lp, d) instead of
  (B*H, Lp, d).

Masking: per-batch prefix key length (k_len), exact exclusion (vs the
reference's -2^15 fill — same delta as ops/flash_attention). In-kernel
counter-hash attention-prob dropout identical to flash_attention (the
keep mask is regenerated, never stored). Self-attention only
(t_q == t_k == len(P)), non-causal — exactly the conformer's use.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_tts_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, NEG_INF, _keep_mask)


# The per-row diagonal realignment uses the hardware strided
# dynamic-rotate (tpu.dynamic_rotate: row i rolls by stride*i), whose
# max total shift must stay under the 128-lane vreg width — hence
# MAX_BLOCK_Q rows per tile (shifts 0..127).
MAX_BLOCK_Q = 128
# Lane lead inside each P-slice window: row r's data starts LEAD-r
# lanes in, so the strided rotate never wraps and the extracted tile
# is a STATIC lane slice at a vreg-aligned offset.
LEAD = 128


class _Geom(NamedTuple):
    """Static layout of the 4-copy padded position table.

    Every copy is read at slice start ``origin + span_q + k0 - q0``
    (all terms multiples of 8); what distinguishes copies is where the
    table rows sit INSIDE them (``base``: copy row ``origin + x`` holds
    P[x + base]):

      ep/ef — past/future extract windows (forward + bwd recompute):
              lane w of a slice must hold P[K - LEAD + w],
              K_past = T-1 + k0 - q0, K_fut = k0 - q0 - 2.
      cp/cf — past/future backward-consumer windows: the conjugated
              scatter lands ``delta = LEAD + 1 - block_q`` lanes over.

    Hashable (a custom_vjp nondiff argument). ``size`` is the per-copy
    row count; ``lp`` the padded table's total rows.
    """
    wp: int
    span_q: int
    seq_len: int
    ep: Tuple[int, int]
    ef: Tuple[int, int]
    cp: Tuple[int, int]
    cf: Tuple[int, int]
    lp: int
    size: int

    @classmethod
    def build(cls, block_q, block_k, seq_len, t_q_pad, t_k_pad):
        wp = block_k + LEAD
        delta = LEAD + 1 - block_q
        span_q = t_q_pad - block_q
        span_k = t_k_pad - block_k
        size = -(-(span_q + span_k + wp + 16) // 8) * 8
        copies = []
        cur = 0
        for k0base, sigma in ((seq_len - 1, 0), (-2, 0),
                              (seq_len - 1, delta), (-2, delta)):
            copies.append((cur, k0base - LEAD + sigma - span_q))
            cur += size
        return cls(wp, span_q, seq_len, *copies, cur, size)


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


def _slice_start(geom, copy, q0, k0):
    """Traced slice start for one copy; provably a multiple of 8."""
    return pl.multiple_of(copy[0] + geom.span_q + k0 - q0, 8)


def _acc_start(geom, copy, q0, k0):
    """Slice start of a CONSUMER copy's window inside the compact dP
    accumulator, which holds only the cp/cf regions (rows
    ``copy_origin - cp_origin``) — half the VMEM of mirroring the full
    table layout."""
    return pl.multiple_of(copy[0] - geom.cp[0] + geom.span_q + k0 - q0, 8)


def _bd_tile(qv, qvs, p_ref, q0, k0, *, block_q, block_k, geom):
    """The (block_q, block_k) tile of rel_shift(q_v P^T), fp32.

    One matmul + one strided rotate + one static lane slice per
    branch; no uniform rolls (see _Geom).
    """
    wp = geom.wp
    s1 = _slice_start(geom, geom.ep, q0, k0)
    s2 = _slice_start(geom, geom.ef, q0, k0)
    p1 = p_ref[0, pl.ds(s1, wp), :]                    # (wp, d)
    p2 = p_ref[0, pl.ds(s2, wp), :]
    a1 = jax.lax.dot_general(qv, p1, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    a2 = jax.lax.dot_general(qvs, p2, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    r1 = pltpu.roll(a1, 0, 1, stride=1, stride_axis=0)
    r2 = pltpu.roll(a2, 0, 1, stride=1, stride_axis=0)
    c1 = r1[:, LEAD:LEAD + block_k]
    c2 = r2[:, LEAD:LEAD + block_k]
    row = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    bd = jnp.where(col <= row, c1,
                   jnp.where(col == row + 1, 0.0, c2))
    return bd


def _scatter_w(ds_masked: jnp.ndarray, wp: int) -> jnp.ndarray:
    """Row-FLIPPED, delta-shifted scatter layout of a dS branch.

    Returns W with ``R @ W == D_shift`` where D_shift[r, w - delta] =
    dA[r, w] is the true scatter of dS back through the extract (dA[r,
    w] += ds[r, s] at w = LEAD + s - r). The strided rotate only
    shifts by +r per row, so -r is obtained by conjugating with the
    row-reversal R; R is applied to the NARROW (bq, bk) matrix before
    zero-padding to wp, and the residual lane shift (delta) plus the
    outer R fold into the consumers: ``dA @ p == R @ (W @ p_shifted)``
    and ``dA^T @ q == shift(W^T @ (R @ q))`` — both absorbed by the
    dedicated consumer P copies / accumulator slice starts.
    """
    # flip on the MXU in the narrow dtype, but ROLL in fp32: the
    # hardware dynamic-rotate only handles 32-bit element types
    f = _flip_rows(ds_masked, out_dtype=jnp.float32)
    x = jnp.pad(f, ((0, 0), (0, wp - ds_masked.shape[1])))
    return pltpu.roll(x, 0, 1, stride=1, stride_axis=0)


def _split_ds(ds, q0, k0, block_q, block_k, wp, mxu_dtype):
    """Split dS into past/future scatter layouts (W1, W2; see
    :func:`_scatter_w`), cast to the MXU dtype — the scatters only
    feed matmuls whose operands are that dtype anyway."""
    row = q0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    ds1 = jnp.where(col <= row, ds, 0.0).astype(mxu_dtype)
    ds2 = jnp.where(col >= row + 2, ds, 0.0).astype(mxu_dtype)
    w1 = _scatter_w(ds1, wp).astype(mxu_dtype)         # (bq, wp)
    w2 = _scatter_w(ds2, wp).astype(mxu_dtype)
    return w1, w2


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref, qvs_ref,
                p_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *,
                sm_scale: float, dropout_rate: float, num_heads: int,
                geom):
    """Grid: (H, B, num_q_blocks, num_k_blocks) — k innermost."""
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)
    bh = bi * num_heads + hi
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
    bd = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                  block_q=block_q, block_k=block_k, geom=geom)
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


def _relpos_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed, *, geom,
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

    grid = (h, b, t_q // block_q, t_k // block_k)
    qm = lambda hi, bi, qi, ki, *_, _h=h: (bi * _h + hi, qi, 0)  # noqa
    km = lambda hi, bi, qi, ki, *_, _h=h: (bi * _h + hi, ki, 0)  # noqa
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, num_heads=h,
                          geom=geom),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), qm),                 # q_u
                pl.BlockSpec((1, block_k, d), km),                 # k
                pl.BlockSpec((1, block_k, d), km),                 # v
                pl.BlockSpec((1, block_q, d), qm),                 # q_v
                pl.BlockSpec((1, block_q, d), qm),                 # q_vs
                pl.BlockSpec((1, lp, d),
                             lambda hi, bi, qi, ki, *_: (hi, 0, 0)),  # p
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), qm),
                pl.BlockSpec((1, 1, block_q),
                             lambda hi, bi, qi, ki, *_, _h=h:
                             (bi * _h + hi, 0, qi)),
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

def _bwd_tile(ds, qv_f, qvs_f, p_ref, dp_acc_ref, q0, k0, *, block_q,
              block_k, geom, mxu_dtype):
    """Shared dS->(dq_v, dq_vs, dP) scatter work for one tile.

    ``qv_f``/``qvs_f``: row-flipped q_v / shifted-q_v tiles (narrow
    flips). Accumulates both branches' dP into ``dp_acc_ref`` at the
    consumer-copy windows and returns (dqv, dqvs) fp32 tiles.
    """
    wp = geom.wp
    w1, w2 = _split_ds(ds, q0, k0, block_q, block_k, wp, mxu_dtype)
    pc1 = p_ref[0, pl.ds(_slice_start(geom, geom.cp, q0, k0), wp), :]
    pc2 = p_ref[0, pl.ds(_slice_start(geom, geom.cf, q0, k0), wp), :]
    a1 = _acc_start(geom, geom.cp, q0, k0)
    a2 = _acc_start(geom, geom.cf, q0, k0)
    # dA @ p == R @ (W @ p_c): flip the NARROW product, not the wide W
    dqv = _flip_rows(jax.lax.dot_general(
        w1, pc1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dqvs = _flip_rows(jax.lax.dot_general(
        w2, pc2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    # dA^T @ q == W^T @ (R @ q), landing delta lanes over -> the
    # consumer-copy rows of the compact accumulator
    dp_acc_ref[pl.ds(a1, wp), :] += jax.lax.dot_general(
        w1, qv_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp_acc_ref[pl.ds(a2, wp), :] += jax.lax.dot_general(
        w2, qvs_f, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dqv, dqvs


def _dq_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref, qvs_ref,
               p_ref, do_ref, lse_ref, delta_ref,
               dq_out_ref, dqv_out_ref, dqvs_out_ref,
               dq_acc_ref, dqv_acc_ref, dqvs_acc_ref, *,
               sm_scale: float, dropout_rate: float, num_heads: int,
               geom):
    """Grid: (H, B, num_q_blocks, num_k_blocks) — accumulate over k.

    dP is NOT produced here (the dkdv kernel owns it); the dq_v path
    still needs the scatter matmuls against the consumer P copies.
    """
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_k = pl.num_programs(3)
    bh = bi * num_heads + hi
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]
    wp = geom.wp

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
    bd = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                  block_q=block_q, block_k=block_k, geom=geom)
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
    w1, w2 = _split_ds(ds, q0, k0, block_q, block_k, wp, qv_ref.dtype)
    s1 = _slice_start(geom, geom.cp, q0, k0)
    s2 = _slice_start(geom, geom.cf, q0, k0)
    pc1 = p_ref[0, pl.ds(s1, wp), :]
    pc2 = p_ref[0, pl.ds(s2, wp), :]
    dqv_acc_ref[:] += _flip_rows(jax.lax.dot_general(
        w1, pc1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dqvs_acc_ref[:] += _flip_rows(jax.lax.dot_general(
        w2, pc2, (((1,), (0,)), ((), ())),
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
                 sm_scale: float, dropout_rate: float, num_heads: int,
                 num_batch: int, geom):
    """Grid: (H, B, num_k_blocks, num_q_blocks), trailing three dims
    sequential — dk/dv accumulate over q per (h, b, k-block); the
    full-length dP accumulator in VMEM scratch integrates over every
    (bi, ki, qi) of one HEAD (cross-batch, in-kernel), dumped once per
    head at the last step."""
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    n_k = pl.num_programs(2)
    n_q = pl.num_programs(3)
    bh = bi * num_heads + hi
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(qi == 0)
    def _init_kv():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    @pl.when((bi == 0) & (ki == 0) & (qi == 0))
    def _init_dp():
        dp_acc_ref[:] = jnp.zeros_like(dp_acc_ref)

    k_len = k_len_ref[bh]
    q0 = qi * block_q
    k0 = ki * block_k

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bd = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                  block_q=block_q, block_k=block_k, geom=geom)
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

    qv_f = _flip_rows(qv_ref[0], out_dtype=qv_ref.dtype)
    qvs_f = _flip_rows(qvs_ref[0], out_dtype=qvs_ref.dtype)
    _bwd_tile(ds, qv_f, qvs_f, p_ref, dp_acc_ref, q0, k0,
              block_q=block_q, block_k=block_k, geom=geom,
              mxu_dtype=qv_ref.dtype)

    @pl.when(qi == n_q - 1)
    def _finalize_kv():
        dk_out_ref[0] = dk_acc_ref[:].astype(dk_out_ref.dtype)
        dv_out_ref[0] = dv_acc_ref[:].astype(dv_out_ref.dtype)

    @pl.when((bi == num_batch - 1) & (ki == n_k - 1) & (qi == n_q - 1))
    def _finalize_dp():
        dp_out_ref[0] = dp_acc_ref[:].astype(dp_out_ref.dtype)


def _fused_bwd_kernel(k_len_ref, seed_ref, q_ref, k_ref, v_ref, qv_ref,
                      qvs_ref, p_ref, do_ref, lse_ref, delta_ref,
                      dq_out_ref, dqv_out_ref, dqvs_out_ref,
                      dk_out_ref, dv_out_ref, dp_out_ref,
                      dk_acc_ref, dv_acc_ref, dp_acc_ref, *,
                      sm_scale: float, dropout_rate: float,
                      num_heads: int, num_batch: int, geom):
    """Single-k-block FUSED backward. Grid: (H, B, num_q_blocks), the
    trailing two dims sequential. With K/V resident as full blocks, the
    expensive tile recompute (scores, in-kernel bias + its diagonal
    rolls, probs, dS + its scatter rolls) happens ONCE per q tile
    instead of once in each of the dq and dk/dv kernels. dq/dq_v/dq_vs
    fall out per tile (no k accumulation needed); dk/dv accumulate in
    VMEM scratch per (h, b); dP accumulates across the WHOLE batch per
    head and dumps once at the final (b, q) step."""
    hi = pl.program_id(0)
    bi = pl.program_id(1)
    qi = pl.program_id(2)
    n_q = pl.num_programs(2)
    bh = bi * num_heads + hi
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]          # == full t_k

    @pl.when(qi == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    @pl.when((bi == 0) & (qi == 0))
    def _init_dp():
        dp_acc_ref[:] = jnp.zeros_like(dp_acc_ref)

    k_len = k_len_ref[bh]
    q0 = qi * block_q
    k0 = jnp.int32(0)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    bd = _bd_tile(qv_ref[0], qvs_ref[0], p_ref, q0, k0,
                  block_q=block_q, block_k=block_k, geom=geom)
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

    qv_f = _flip_rows(qv_ref[0], out_dtype=qv_ref.dtype)
    qvs_f = _flip_rows(qvs_ref[0], out_dtype=qvs_ref.dtype)
    dq_v, dq_vs = _bwd_tile(ds, qv_f, qvs_f, p_ref, dp_acc_ref, q0, k0,
                            block_q=block_q, block_k=block_k, geom=geom,
                            mxu_dtype=qv_ref.dtype)
    dqv_out_ref[0] = dq_v.astype(dqv_out_ref.dtype)
    dqvs_out_ref[0] = dq_vs.astype(dqvs_out_ref.dtype)

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_out_ref[0] = dk_acc_ref[:].astype(dk_out_ref.dtype)
        dv_out_ref[0] = dv_acc_ref[:].astype(dv_out_ref.dtype)

    @pl.when((bi == num_batch - 1) & (qi == n_q - 1))
    def _finalize_dp():
        dp_out_ref[0] = dp_acc_ref[:].astype(dp_out_ref.dtype)


def _relpos_bwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse, g, *,
                geom, sm_scale, dropout_rate, block_q, block_k,
                interpret):
    b, h, t_q, d = q_u.shape
    t_k = k.shape[2]
    lp = p_big.shape[1]
    lp_acc = 2 * geom.size        # compact dP accumulator: cp+cf regions
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
                  num_heads=h, geom=geom)

    if n_k == 1:
        # fused single-pass backward (the default full-row-K case)
        fq = pl.BlockSpec((1, block_q, d),
                          lambda hi, bi, qi, *_, _h=h:
                          (bi * _h + hi, qi, 0))
        fk = pl.BlockSpec((1, block_k, d),
                          lambda hi, bi, qi, *_, _h=h:
                          (bi * _h + hi, 0, 0))
        frow = pl.BlockSpec((1, 1, block_q),
                            lambda hi, bi, qi, *_, _h=h:
                            (bi * _h + hi, 0, qi))
        fp = pl.BlockSpec((1, lp, d),
                          lambda hi, bi, qi, *_: (hi, 0, 0))
        dq, dqv, dqvs, dk, dv, dp_big = pl.pallas_call(
            functools.partial(_fused_bwd_kernel, num_batch=b, **common),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary",
                                     "arbitrary")),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(h, b, n_q),
                in_specs=[fq, fk, fk, fq, fq, fp, fq, frow, frow],
                out_specs=[
                    fq, fq, fq, fk, fk,
                    pl.BlockSpec((1, lp_acc, d),
                                 lambda hi, bi, qi, *_: (hi, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((block_k, d), jnp.float32),
                    pltpu.VMEM((lp_acc, d), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bh, t_q, d), q_u.dtype),
                jax.ShapeDtypeStruct((bh, t_q, d), q_v.dtype),
                jax.ShapeDtypeStruct((bh, t_q, d), q_vs.dtype),
                jax.ShapeDtypeStruct((bh, t_k, d), k.dtype),
                jax.ShapeDtypeStruct((bh, t_k, d), v.dtype),
                jax.ShapeDtypeStruct((h, lp_acc, d), jnp.float32),
            ],
            interpret=interpret,
        )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big, do_r,
          lse_r, delta_r)
        dq = dq.reshape(b, h, t_q, d)
        dqv = dqv.reshape(b, h, t_q, d)
        dqvs = dqvs.reshape(b, h, t_q, d)
        dk = dk.reshape(b, h, t_k, d)
        dv = dv.reshape(b, h, t_k, d)
        return dq, dqv, dqvs, dk, dv, dp_big

    qm = lambda hi, bi, qi, ki, *_, _h=h: (bi * _h + hi, qi, 0)  # noqa
    km = lambda hi, bi, qi, ki, *_, _h=h: (bi * _h + hi, ki, 0)  # noqa
    row_m = lambda hi, bi, qi, ki, *_, _h=h: (bi * _h + hi, 0, qi)  # noqa
    p_m = lambda hi, bi, qi, ki, *_: (hi, 0, 0)  # noqa

    dq, dqv, dqvs = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(h, b, n_q, n_k),
            in_specs=[pl.BlockSpec((1, block_q, d), qm),
                      pl.BlockSpec((1, block_k, d), km),
                      pl.BlockSpec((1, block_k, d), km),
                      pl.BlockSpec((1, block_q, d), qm),
                      pl.BlockSpec((1, block_q, d), qm),
                      pl.BlockSpec((1, lp, d), p_m),
                      pl.BlockSpec((1, block_q, d), qm),
                      pl.BlockSpec((1, 1, block_q), row_m),
                      pl.BlockSpec((1, 1, block_q), row_m)],
            out_specs=[pl.BlockSpec((1, block_q, d), qm)] * 3,
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, t_q, d), q_u.dtype)] * 3,
        interpret=interpret,
    )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big, do_r,
      lse_r, delta_r)

    # dkdv grid: (h, b, ki, qi) — index maps swap the roles
    qm2 = lambda hi, bi, ki, qi, *_, _h=h: (bi * _h + hi, qi, 0)  # noqa
    km2 = lambda hi, bi, ki, qi, *_, _h=h: (bi * _h + hi, ki, 0)  # noqa
    row2 = lambda hi, bi, ki, qi, *_, _h=h: (bi * _h + hi, 0, qi)  # noqa
    p_m2 = lambda hi, bi, ki, qi, *_: (hi, 0, 0)  # noqa
    dk, dv, dp_big = pl.pallas_call(
        functools.partial(_dkdv_kernel, num_batch=b, **common),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary")),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(h, b, n_k, n_q),
            in_specs=[pl.BlockSpec((1, block_q, d), qm2),
                      pl.BlockSpec((1, block_k, d), km2),
                      pl.BlockSpec((1, block_k, d), km2),
                      pl.BlockSpec((1, block_q, d), qm2),
                      pl.BlockSpec((1, block_q, d), qm2),
                      pl.BlockSpec((1, lp, d), p_m2),
                      pl.BlockSpec((1, block_q, d), qm2),
                      pl.BlockSpec((1, 1, block_q), row2),
                      pl.BlockSpec((1, 1, block_q), row2)],
            out_specs=[
                pl.BlockSpec((1, block_k, d), km2),
                pl.BlockSpec((1, block_k, d), km2),
                pl.BlockSpec((1, lp_acc, d), p_m2),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((lp_acc, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_k, d), k.dtype),
            jax.ShapeDtypeStruct((bh, t_k, d), v.dtype),
            jax.ShapeDtypeStruct((h, lp_acc, d), jnp.float32),
        ],
        interpret=interpret,
    )(k_len_bh, seed_arr, q_r, k_r, v_r, qv_r, qvs_r, p_big, do_r,
      lse_r, delta_r)

    dq = dq.reshape(b, h, t_q, d)
    dqv = dqv.reshape(b, h, t_q, d)
    dqvs = dqvs.reshape(b, h, t_q, d)
    dk = dk.reshape(b, h, t_k, d)
    dv = dv.reshape(b, h, t_k, d)
    return dq, dqv, dqvs, dk, dv, dp_big


# ---------------------------------------------------------------------------
# custom_vjp core (pre-padded inputs) + public wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _flash_rp(q_u, q_v, q_vs, k, v, p, k_len, seed, geom,
              sm_scale, dropout_rate, block_q, block_k, interpret):
    p_big = _build_p_big(p, geom)
    out, _ = _relpos_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed,
                         geom=geom, sm_scale=sm_scale,
                         dropout_rate=dropout_rate, block_q=block_q,
                         block_k=block_k, interpret=interpret)
    return out


def _flash_rp_fwd(q_u, q_v, q_vs, k, v, p, k_len, seed, geom,
                  sm_scale, dropout_rate, block_q, block_k, interpret):
    p_big = _build_p_big(p, geom)
    out, lse = _relpos_fwd(q_u, q_v, q_vs, k, v, p_big, k_len, seed,
                           geom=geom, sm_scale=sm_scale,
                           dropout_rate=dropout_rate, block_q=block_q,
                           block_k=block_k, interpret=interpret)
    return out, (q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse)


def _flash_rp_bwd(geom, sm_scale, dropout_rate, block_q, block_k,
                  interpret, residuals, g):
    q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse = residuals
    dq, dqv, dqvs, dk, dv, dp_acc = _relpos_bwd(
        q_u, q_v, q_vs, k, v, p_big, k_len, seed, out, lse, g,
        geom=geom, sm_scale=sm_scale, dropout_rate=dropout_rate,
        block_q=block_q, block_k=block_k, interpret=interpret)
    dp = _dp_from_big(dp_acc, geom).astype(p_big.dtype)
    return dq, dqv, dqvs, dk, dv, dp, None, None


_flash_rp.defvjp(_flash_rp_fwd, _flash_rp_bwd)


def _build_p_big(p, geom):
    """(h, T, d) table -> (h, lp, d) 4-copy padded layout (see _Geom):
    copy row ``origin + x`` holds P[x + base]."""
    h, t, d = p.shape
    p_big = jnp.zeros((h, geom.lp, d), p.dtype)
    for origin, base in (geom.ep, geom.ef, geom.cp, geom.cf):
        g_lo = max(0, base)
        g_hi = min(t, base + geom.size)
        if g_hi > g_lo:
            p_big = jax.lax.dynamic_update_slice(
                p_big, p[:, g_lo:g_hi, :], (0, origin + g_lo - base, 0))
    return p_big


def _dp_from_big(dp_big, geom):
    """Sum the two backward-consumer copies' rows (compact layout:
    cp at row 0, cf at row ``size``) back into dP."""
    h, _, d = dp_big.shape
    t = geom.seq_len
    dp = jnp.zeros((h, t, d), dp_big.dtype)
    for origin, (_, base) in ((0, geom.cp), (geom.size, geom.cf)):
        g_lo = max(0, base)
        g_hi = min(t, base + geom.size)
        if g_hi > g_lo:
            rows = dp_big[:, origin + g_lo - base:
                          origin + g_hi - base, :]
            dp = dp.at[:, g_lo:g_hi, :].add(rows)
    return dp


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

    t8 = -(-t // 8) * 8          # blocks stay multiples of 8 (Mosaic)
    # q blocks cap at MAX_BLOCK_Q: the strided dynamic-rotate's shifts
    # (0..block_q-1) must fit under the LEAD vreg width
    block_q = min(block_q, MAX_BLOCK_Q, max(t8, 8))
    block_k = min(block_k, max(t8, 8))
    t_q_pad = -(-t // block_q) * block_q
    t_k_pad = -(-t // block_k) * block_k
    geom = _Geom.build(block_q, block_k, t, t_q_pad, t_k_pad)
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

    out = _flash_rp(q_u_p, q_v_p, q_vs_p, k_p, v_p, p, k_len,
                    jnp.asarray(dropout_seed, jnp.int32), geom,
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
