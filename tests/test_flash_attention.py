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
    out = flash_attention(q, k, v, k_len, causal, None, 32, 32, True)
    ref = reference_attention(q, k, v, k_len, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_uneven_lengths_cross_attention():
    # cross-attention shape: T_q != T_k
    q, k, v = rand_qkv(1, t_q=96, t_k=48)
    k_len = jnp.array([48, 17], jnp.int32)
    out = flash_attention(q, k, v, k_len, False, None, 32, 16, True)
    ref = reference_attention(q, k, v, k_len, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_block_not_dividing_seq():
    q, k, v = rand_qkv(2, t_q=50, t_k=50)
    k_len = jnp.array([50, 33], jnp.int32)
    out = flash_attention(q, k, v, k_len, False, None, 32, 32, True)
    ref = reference_attention(q, k, v, k_len, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gradients_match_oracle(causal):
    q, k, v = rand_qkv(3, t_q=32, t_k=32, d=16)
    k_len = jnp.array([32, 20], jnp.int32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, k_len, causal, None, 16, 16, True)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v):
        o = reference_attention(q, k, v, k_len, causal)
        return jnp.sum(o ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fully_masked_query_rows_are_zero():
    q, k, v = rand_qkv(4, t_q=16, t_k=16, d=8)
    k_len = jnp.array([0, 8], jnp.int32)   # batch 0: no valid keys
    out = flash_attention(q, k, v, k_len, False, None, 16, 16, True)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    assert not np.allclose(np.asarray(out[1]), 0.0)
