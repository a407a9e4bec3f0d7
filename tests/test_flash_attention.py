"""Flash attention kernel vs jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_tts_tpu.ops.flash_attention import (
    flash_attention, reference_attention)


def rand_qkv(seed, b=2, h=2, t_q=64, t_k=64, d=32):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, h, t_q, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, t_k, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, t_k, d).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_oracle(causal):
    q, k, v = rand_qkv(0)
    k_len = jnp.array([64, 40], jnp.int32)
    out = flash_attention(q, k, v, k_len, causal=causal,
                          block_q=32, block_k=32, interpret=True)
    ref = reference_attention(q, k, v, k_len, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_uneven_lengths_cross_attention():
    # cross-attention shape: T_q != T_k
    q, k, v = rand_qkv(1, t_q=96, t_k=48)
    k_len = jnp.array([48, 17], jnp.int32)
    out = flash_attention(q, k, v, k_len, block_q=32, block_k=16,
                          interpret=True)
    ref = reference_attention(q, k, v, k_len, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_block_not_dividing_seq():
    q, k, v = rand_qkv(2, t_q=50, t_k=50)
    k_len = jnp.array([50, 33], jnp.int32)
    out = flash_attention(q, k, v, k_len, block_q=32, block_k=32,
                          interpret=True)
    ref = reference_attention(q, k, v, k_len, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_match_oracle(causal):
    q, k, v = rand_qkv(3, t_q=32, t_k=32, d=16)
    k_len = jnp.array([32, 20], jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, k_len, causal=causal,
                            block_q=16, block_k=16, interpret=True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        o = reference_attention(q, k, v, k_len, causal)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_flash_gradients_match_oracle_padded_q():
    # q length NOT a block multiple: padded q rows must not pollute dk/dv
    q, k, v = rand_qkv(7, t_q=40, t_k=32, d=16)
    k_len = jnp.array([32, 20], jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, k_len, block_q=16, block_k=16,
                            interpret=True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        o = reference_attention(q, k, v, k_len, False)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fully_masked_query_rows_are_zero():
    q, k, v = rand_qkv(4, t_q=16, t_k=16, d=8)
    k_len = jnp.array([0, 8], jnp.int32)   # batch 0: no valid keys
    out = flash_attention(q, k, v, k_len, block_q=16, block_k=16,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    assert not np.allclose(np.asarray(out[1]), 0.0)


# ---------------------------------------------------------------------------
# in-kernel dropout
# ---------------------------------------------------------------------------

def test_dropout_keep_rate_and_scaling():
    """Dropped outputs are an unbiased estimate: each attention term is
    kept with prob (1-r) and scaled 1/(1-r); with V = ones the output of
    every row is sum(p * keep/keep_prob) whose mean over seeds is 1."""
    rate = 0.3
    q, k, _ = rand_qkv(5, b=1, h=1, t_q=64, t_k=64, d=16)
    v = jnp.ones((1, 1, 64, 16), jnp.float32)
    k_len = jnp.array([64], jnp.int32)
    outs = []
    for seed in range(8):
        o = flash_attention(q, k, v, k_len, dropout_rate=rate,
                            dropout_seed=seed, block_q=32, block_k=32,
                            interpret=True)
        outs.append(np.asarray(o))
    mean = np.mean(outs)
    assert abs(mean - 1.0) < 0.05, mean   # unbiased within MC noise
    # different seeds give different masks
    assert not np.allclose(outs[0], outs[1])


def test_dropout_deterministic_per_seed():
    q, k, v = rand_qkv(6, b=1, h=2, t_q=32, t_k=32, d=16)
    k_len = jnp.array([32], jnp.int32)
    kw = dict(dropout_rate=0.5, dropout_seed=123, block_q=16,
              block_k=16, interpret=True)
    o1 = flash_attention(q, k, v, k_len, **kw)
    o2 = flash_attention(q, k, v, k_len, **kw)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_dropout_backward_consistent_with_forward():
    """grad must see the SAME mask the forward applied: finite-difference
    check of sum(flash(q)) in a random direction."""
    q, k, v = rand_qkv(8, b=1, h=1, t_q=32, t_k=32, d=16)
    k_len = jnp.array([32], jnp.int32)
    kw = dict(dropout_rate=0.4, dropout_seed=7, block_q=16, block_k=16,
              interpret=True)

    def f(q):
        return jnp.sum(flash_attention(q, k, v, k_len, **kw))

    g = jax.grad(f)(q)
    rs = np.random.RandomState(0)
    direction = jnp.asarray(rs.randn(*q.shape).astype(np.float32))
    eps = 1e-3
    fd = (f(q + eps * direction) - f(q - eps * direction)) / (2 * eps)
    analytic = jnp.sum(g * direction)
    np.testing.assert_allclose(float(fd), float(analytic),
                               rtol=2e-2, atol=2e-2)


# ---------------- bias (relative-attention core) variant ----------------

def _oracle_bias(q, k, v, bias, k_len):
    d_k = q.shape[-1]
    s = (jnp.einsum("bhqd,bhkd->bhqk", q, k,
                    preferred_element_type=jnp.float32)
         + bias.astype(jnp.float32)) / jnp.sqrt(jnp.float32(d_k))
    mask = (jnp.arange(k.shape[2])[None, :]
            < k_len[:, None])[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(mask.any(-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def test_flash_bias_matches_oracle():
    from transformer_tts_tpu.ops.flash_attention import (
        flash_attention_with_bias)
    q, k, v = rand_qkv(3)
    rs = np.random.RandomState(4)
    bias = jnp.asarray(rs.randn(2, 2, 64, 64).astype(np.float32))
    k_len = jnp.array([64, 33], jnp.int32)
    out = flash_attention_with_bias(q, k, v, bias, k_len,
                                    block_q=32, block_k=32,
                                    interpret=True)
    ref = _oracle_bias(q, k, v, bias, k_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_bias_gradients_match_oracle():
    from transformer_tts_tpu.ops.flash_attention import (
        flash_attention_with_bias)
    q, k, v = rand_qkv(5, t_q=48, t_k=48)
    rs = np.random.RandomState(6)
    bias = jnp.asarray(rs.randn(2, 2, 48, 48).astype(np.float32))
    k_len = jnp.array([48, 29], jnp.int32)
    w = jnp.asarray(rs.randn(2, 2, 48, 32).astype(np.float32))

    def loss_flash(q, k, v, bias):
        o = flash_attention_with_bias(q, k, v, bias, k_len, block_q=16,
                                      block_k=16, interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_oracle_bias(q, k, v, bias, k_len) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("q k v bias".split(), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_relative_mha_flash_path_matches_jnp():
    """The conformer attention flash path == the jnp path (fp32, no
    dropout), exercised end-to-end through the module."""
    from unittest import mock
    from transformer_tts_tpu.ops.attention import (
        RelativeMultiHeadAttention)
    from transformer_tts_tpu.ops import attention as A

    rs = np.random.RandomState(0)
    b, t, d, h = 2, 64, 32, 2
    x = jnp.asarray(rs.randn(b, t, d).astype(np.float32))
    pos = jnp.asarray(rs.randn(1, t, d).astype(np.float32))
    k_len = jnp.array([t, 37], jnp.int32)
    mask = (jnp.arange(t)[None, :] < k_len[:, None])[:, None, :]

    mod = RelativeMultiHeadAttention(heads=h, d_model=d, dropout=0.0,
                                     use_flash=True)
    variables = mod.init(jax.random.PRNGKey(0), x, x, x, pos, mask,
                         train=False)

    ref_out, _ = mod.apply(variables, x, x, x, pos, mask, train=False)

    # force the flash branch on CPU: interpret-mode kernel, no backend
    # or length gating (r3: the module dispatches to the in-kernel
    # rel-pos kernel, ops/flash_relpos.py)
    import transformer_tts_tpu.ops.flash_relpos as FR
    real = FR.flash_relpos_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return real(*a, **kw)

    with mock.patch.object(A, "FLASH_MIN_KEY_LEN", 1), \
            mock.patch.object(jax, "default_backend",
                              lambda: "tpu"), \
            mock.patch.object(FR, "flash_relpos_attention", interp):
        flash_out, _ = mod.apply(variables, x, x, x, pos, mask,
                                 train=False, k_len=k_len)

    # compare only valid query rows (masked rows: uniform-avg vs 0)
    valid = np.asarray(mask[:, 0, :])
    np.testing.assert_allclose(
        np.asarray(flash_out)[valid], np.asarray(ref_out)[valid],
        rtol=2e-4, atol=2e-4)
