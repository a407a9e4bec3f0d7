"""MFU candidate micro-A/Bs on the chip (round-5 verdict item 4).

Each candidate is measured in isolation at the exact production shape
with the honest chained-slope clock before any model plumbing is built
— the round-4 negative results (Pallas depthwise conv, fused
pitch+energy predictors — docs/PERF_NOTES.md) both looked good on paper
and lost on the chip, so paper analysis doesn't gate here, measurement
does.

Candidates:

1. ``qkv``   — three (BT,384)x(384,384) gemms (the separate
              q/k/v Dense projections of ops/attention.py:98-100)
              vs ONE (BT,384)x(384,1152) gemm + split.
2. ``conv3`` — nn.Conv k=3 SAME at the VariancePredictor shape
              (B=32, T=1024, 384->256 and 256->256) vs explicit
              im2col (stack 3 shifts -> one gemm).
3. ``conv5`` — nn.Conv k=5 CAUSAL at the PostConvNet shape
              (80->256, 256->256) vs im2col.
4. ``ffn``   — the conv-FFN inner pair at decoder shape (k=1:
              384->1536->384) fwd+bwd: Dense vs Dense-with-fused-bias
              baseline sanity (reports the achievable gemm rate that
              bounds every other candidate).

Run: python scripts/mxu_ab.py [candidate ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from transformer_tts_tpu.bench_utils import (  # noqa: E402
    enable_compilation_cache, slope_time)

B, T = 32, 1024
BT = B * T


def _time_fn(fn, *args, n_long=8):
    import jax
    import jax.numpy as jnp
    jfn = jax.jit(fn)

    def chain(k):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(k):
            carry = jfn(*args, carry)
        return float(carry)

    chain(2)
    return slope_time(chain, n_long).per_iter


def _gflops(ms, flops):
    return flops / (ms * 1e-3) / 1e12


def cand_qkv():
    import jax
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(BT, 384).astype(np.float32), jnp.bfloat16)
    ws = [jnp.asarray(rs.randn(384, 384).astype(np.float32) * 0.05,
                      jnp.bfloat16) for _ in range(3)]
    wcat = jnp.concatenate(ws, axis=1)

    def sep_fwd(x, w1, w2, w3, carry):
        x = x + carry.astype(x.dtype)
        return (jnp.sum(x @ w1) + jnp.sum(x @ w2)
                + jnp.sum(x @ w3)).astype(jnp.float32)

    def cat_fwd(x, w, carry):
        x = x + carry.astype(x.dtype)
        y = x @ w
        q, k, v = jnp.split(y, 3, axis=1)
        return (jnp.sum(q) + jnp.sum(k) + jnp.sum(v)).astype(jnp.float32)

    flops_fwd = 3 * 2 * BT * 384 * 384
    t_sep = _time_fn(sep_fwd, x, *ws)
    t_cat = _time_fn(cat_fwd, x, wcat)

    # fwd+bwd wrt weights+input (the training cost)
    def sep_loss(x, w1, w2, w3):
        return (jnp.sum(x @ w1) + jnp.sum(x @ w2) + jnp.sum(x @ w3)) \
            .astype(jnp.float32)

    def cat_loss(x, w):
        return jnp.sum(x @ w).astype(jnp.float32)

    g_sep = jax.grad(sep_loss, argnums=(0, 1, 2, 3))
    g_cat = jax.grad(cat_loss, argnums=(0, 1))

    def sep_fb(x, w1, w2, w3, carry):
        x = x + carry.astype(x.dtype)
        gs = g_sep(x, w1, w2, w3)
        return sum(jnp.sum(g).astype(jnp.float32) for g in gs)

    def cat_fb(x, w, carry):
        x = x + carry.astype(x.dtype)
        gs = g_cat(x, w)
        return sum(jnp.sum(g).astype(jnp.float32) for g in gs)

    t_sep_fb = _time_fn(sep_fb, x, *ws)
    t_cat_fb = _time_fn(cat_fb, x, wcat)
    print(f"qkv   fwd: sep {t_sep*1e3:.3f} ms "
          f"({_gflops(t_sep*1e3, flops_fwd):.0f} TF/s) "
          f"cat {t_cat*1e3:.3f} ms "
          f"({_gflops(t_cat*1e3, flops_fwd):.0f} TF/s)")
    print(f"qkv fwd+bwd: sep {t_sep_fb*1e3:.3f} ms  "
          f"cat {t_cat_fb*1e3:.3f} ms  "
          f"(3x flops = {3*flops_fwd/1e9:.1f} GF)")


def _conv_pair(kernel, cin, cout, causal):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, cin).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rs.randn(kernel, cin, cout).astype(np.float32) * 0.05,
                    jnp.bfloat16)

    conv = nn.Conv(cout, (kernel,),
                   padding=((kernel - 1, 0),) if causal else "SAME",
                   use_bias=False, dtype=jnp.bfloat16)
    params = {"params": {"kernel": w}}

    def xla_fwd(x, carry):
        x = x + carry.astype(x.dtype)
        return jnp.sum(conv.apply(params, x)).astype(jnp.float32)

    def im2col(x, w):
        # stack k shifted views -> (B, T, k*cin) @ (k*cin, cout).
        # jnp.roll realizes the shifted copies (edge wrap differs from
        # zero-pad numerics but the data movement cost is identical —
        # this script measures time, not values).
        center = 0 if causal else (kernel - 1) // 2
        cols = [jnp.roll(x, (kernel - 1) - i - center, axis=1)
                for i in range(kernel)]
        xk = jnp.concatenate(cols, axis=-1)
        return xk @ w.reshape(kernel * cin, cout)

    def im_fwd(x, w, carry):
        x = x + carry.astype(x.dtype)
        return jnp.sum(im2col(x, w)).astype(jnp.float32)

    flops = 2 * B * T * kernel * cin * cout
    t_xla = _time_fn(xla_fwd, x)
    t_im = _time_fn(im_fwd, x, w)

    gx = jax.grad(lambda x: jnp.sum(conv.apply(params, x))
                  .astype(jnp.float32))
    gi = jax.grad(lambda x, w: jnp.sum(im2col(x, w)).astype(jnp.float32),
                  argnums=(0, 1))

    def xla_fb(x, carry):
        x = x + carry.astype(x.dtype)
        return jnp.sum(gx(x)).astype(jnp.float32)

    def im_fb(x, w, carry):
        x = x + carry.astype(x.dtype)
        gs = gi(x, w)
        return sum(jnp.sum(g).astype(jnp.float32) for g in gs)

    t_xla_fb = _time_fn(xla_fb, x)
    t_im_fb = _time_fn(im_fb, x, w)
    tag = f"k{kernel} {cin}->{cout} {'causal' if causal else 'same'}"
    print(f"conv {tag} fwd: xla {t_xla*1e3:.3f} ms "
          f"({_gflops(t_xla*1e3, flops):.0f} TF/s) "
          f"im2col {t_im*1e3:.3f} ms "
          f"({_gflops(t_im*1e3, flops):.0f} TF/s)")
    print(f"conv {tag} f+b: xla {t_xla_fb*1e3:.3f} ms "
          f"im2col {t_im_fb*1e3:.3f} ms")


def cand_conv3():
    _conv_pair(3, 384, 256, causal=False)
    _conv_pair(3, 256, 256, causal=False)


def cand_conv5():
    _conv_pair(5, 80, 256, causal=True)
    _conv_pair(5, 256, 256, causal=True)


def cand_ffn():
    import jax
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(BT, 384).astype(np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(384, 1536).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    w2 = jnp.asarray(rs.randn(1536, 384).astype(np.float32) * 0.05,
                     jnp.bfloat16)

    def fwd(x, w1, w2, carry):
        x = x + carry.astype(x.dtype)
        return jnp.sum(jax.nn.relu(x @ w1) @ w2).astype(jnp.float32)

    flops = 2 * BT * 384 * 1536 * 2
    t = _time_fn(fwd, x, w1, w2)
    print(f"ffn  fwd: {t*1e3:.3f} ms ({_gflops(t*1e3, flops):.0f} TF/s) "
          f"<- achievable gemm rate bound at d384")


def main():
    enable_compilation_cache()
    todo = sys.argv[1:] or ["ffn", "qkv", "conv3", "conv5"]
    for name in todo:
        globals()[f"cand_{name}"]()


if __name__ == "__main__":
    main()
