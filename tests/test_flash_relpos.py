"""In-kernel relative-position flash attention vs the jnp oracle.

Interpret-mode (CPU) checks of ops/flash_relpos.py: forward and ALL
five gradients (q_u, q_v, k, v, P) against reference_relpos_attention —
which itself uses the reference rel_shift (ops/attention.rel_shift,
Models/modules.py:256-267), so the wrapped "future" values are covered
bit-for-bit. On-chip numerics are exercised by the conformer family
tests + scripts/flash_ab.py A/B.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_tts_tpu.ops.flash_relpos import (
    flash_relpos_attention, reference_relpos_attention)


def _data(t, b=2, h=2, d=8, seed=0):
    rs = np.random.RandomState(seed)
    qu, qv, k, v = (jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
                    for _ in range(4))
    p = jnp.asarray(rs.randn(h, t, d).astype(np.float32))
    k_len = jnp.asarray([t, max(3, t // 2)], jnp.int32)
    g = jnp.asarray(rs.randn(b, h, t, d).astype(np.float32))
    return qu, qv, k, v, p, k_len, g


@pytest.mark.parametrize("t,bq,bk", [(48, 16, 16), (37, 16, 32),
                                     (50, 32, 16), (16, 64, 64)])
def test_forward_matches_oracle(t, bq, bk):
    qu, qv, k, v, p, k_len, _ = _data(t)
    out = flash_relpos_attention(qu, qv, k, v, p, k_len,
                                 block_q=bq, block_k=bk, interpret=True)
    ref = reference_relpos_attention(qu, qv, k, v, p, k_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)


@pytest.mark.parametrize("t,bq,bk", [(48, 16, 16), (37, 16, 32),
                                     (48, 16, 64),   # fused bwd (n_k==1)
                                     (30, 32, 32)])  # fused, padded t
def test_all_gradients_match_oracle(t, bq, bk):
    qu, qv, k, v, p, k_len, g = _data(t, seed=1)

    def f_flash(*a):
        return jnp.sum(flash_relpos_attention(
            *a, k_len, block_q=bq, block_k=bk, interpret=True) * g)

    def f_ref(*a):
        return jnp.sum(reference_relpos_attention(*a, k_len) * g)

    gf = jax.grad(f_flash, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(qu, qv, k, v, p)
    for name, a, b in zip(["dq_u", "dq_v", "dk", "dv", "dp"], gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, err_msg=name)


def test_dropout_deterministic_and_grad_sane():
    t, bq, bk = 32, 16, 16
    qu, qv, k, v, p, k_len, _ = _data(t, b=2, seed=2)

    def f(qu_):
        return flash_relpos_attention(
            qu_, qv, k, v, p, k_len, dropout_rate=0.3, dropout_seed=7,
            block_q=bq, block_k=bk, interpret=True)

    o1, o2 = f(qu), f(qu)
    assert bool(jnp.all(o1 == o2))          # same seed -> same mask
    o3 = flash_relpos_attention(
        qu, qv, k, v, p, k_len, dropout_rate=0.3, dropout_seed=8,
        block_q=bq, block_k=bk, interpret=True)
    assert not bool(jnp.all(o1 == o3))      # different seed -> different

    # analytic dq_u vs central differences THROUGH the dropout mask
    an = jax.grad(lambda q_: jnp.sum(f(q_)))(qu)
    eps = 1e-3
    i = (0, 0, 3, 2)
    num = (jnp.sum(f(qu.at[i].add(eps)))
           - jnp.sum(f(qu.at[i].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(float(num), float(an[i]), rtol=2e-2)


def test_shape_contracts():
    qu, qv, k, v, p, k_len, _ = _data(24)
    with pytest.raises(ValueError, match="self-attention"):
        flash_relpos_attention(qu, qv, k[:, :, :12], v[:, :, :12], p,
                               k_len, interpret=True)
    with pytest.raises(ValueError, match="p shape"):
        flash_relpos_attention(qu, qv, k, v, p[:, :12], k_len,
                               interpret=True)


def test_relative_mha_flash_guard_rejects_structured_mask():
    """ADVICE r2: k_len + a structured mask must fail fast."""
    from transformer_tts_tpu.ops.attention import (
        RelativeMultiHeadAttention)
    m = RelativeMultiHeadAttention(heads=2, d_model=16, use_flash=True)
    x = jnp.zeros((2, 8, 16))
    pos = jnp.zeros((1, 8, 16))
    band = jnp.ones((2, 8, 8), bool)
    params = m.init(jax.random.PRNGKey(0), x, x, x, pos, None,
                    train=False)
    with pytest.raises(ValueError, match="prefix"):
        m.apply(params, x, x, x, pos, band, train=False,
                k_len=jnp.full((2,), 8, jnp.int32))
