"""Kernel-level flash vs XLA attention A/B (honest clock).

Training shape of record: B=32, H=4, T=1024, d=96 (parity config at the
32x1024 bench bucket). Measures forward and forward+backward, with and
without attention-prob dropout, flash vs the jnp/XLA path.

Run: python scripts/flash_ab.py [fwd|bwd|drop|relpos] [T ...]

``relpos``: the conformer attention core — the r3 in-kernel
relative-position kernel (ops/flash_relpos.py) vs the r2
bias-materialization path (rel_shift einsum in XLA + bias-input flash).
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from transformer_tts_tpu.bench_utils import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.bench_utils import slope_time
    from transformer_tts_tpu.ops.flash_attention import (
        flash_attention, reference_attention)

    modes = [a for a in sys.argv[1:] if not a.isdigit()] or ["fwd", "bwd"]
    t_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1024]

    b, h, d = 32, 4, 96
    rs = np.random.RandomState(0)

    for t in t_list:
        q = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
        k = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
        v = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
        k_len = jnp.full((b,), t, jnp.int32)

        def run_pair(name, fn):
            jfn = jax.jit(fn)

            def chain(n):
                carry = jnp.zeros((), jnp.bfloat16)
                for _ in range(n):
                    carry = jfn(q + carry, k, v, k_len)
                return float(carry)

            chain(1)
            tm = slope_time(chain, 8, repeats=7)
            print(f"T={t} {name:24s} {tm.per_iter * 1e3:8.3f} ms",
                  flush=True)

        if "fwd" in modes:
            run_pair("flash fwd", lambda q, k, v, kl: jnp.sum(
                flash_attention(q, k, v, kl)))
            run_pair("xla fwd", lambda q, k, v, kl: jnp.sum(
                reference_attention(q, k, v, kl)))
        if "drop" in modes:
            # flash in-kernel dropout vs XLA attention + flax-style mask
            import flax.linen as nn

            def loss_flash_d(q, k, v, kl):
                o = flash_attention(q, k, v, kl, dropout_rate=0.1,
                                    dropout_seed=3)
                return jnp.sum(o.astype(jnp.float32))

            key = jax.random.key(0, impl='rbg')

            def loss_xla_d(q, k, v, kl):
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                               preferred_element_type=jnp.float32)
                s = s / jnp.sqrt(jnp.float32(d))
                mask = (jnp.arange(t)[None, :] < kl[:, None])[:, None, None]
                s = jnp.where(mask, s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                keep = jax.random.bernoulli(key, 0.9, p.shape)
                p = jnp.where(keep, p / 0.9, 0.0)
                o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                               preferred_element_type=jnp.float32)
                return jnp.sum(o)

            run_pair("flash fwd+bwd drop", lambda q, k, v, kl: sum(
                jnp.sum(g.astype(jnp.float32)) for g in
                jax.grad(loss_flash_d, argnums=(0, 1, 2))(q, k, v, kl)
            ).astype(jnp.bfloat16))
            run_pair("xla fwd+bwd drop", lambda q, k, v, kl: sum(
                jnp.sum(g.astype(jnp.float32)) for g in
                jax.grad(loss_xla_d, argnums=(0, 1, 2))(q, k, v, kl)
            ).astype(jnp.bfloat16))
        if "relpos" in modes:
            from transformer_tts_tpu.ops.attention import rel_shift
            from transformer_tts_tpu.ops.flash_attention import (
                flash_attention_with_bias)
            from transformer_tts_tpu.ops.flash_relpos import (
                flash_relpos_attention)
            qv = jnp.asarray(rs.randn(b, h, t, d), jnp.bfloat16)
            p_tab = jnp.asarray(rs.randn(h, t, d), jnp.bfloat16)

            def loss_new(q, k, v, kl):
                o = flash_relpos_attention(q, qv, k, v, p_tab, kl,
                                           dropout_rate=0.1,
                                           dropout_seed=3)
                return jnp.sum(o.astype(jnp.float32))

            def loss_old(q, k, v, kl):
                bias = rel_shift(jnp.einsum(
                    "bhqd,bhkd->bhqk", qv,
                    jnp.broadcast_to(p_tab[None], qv.shape),
                    preferred_element_type=jnp.float32).astype(q.dtype))
                o = flash_attention_with_bias(q, k, v, bias, kl,
                                              dropout_rate=0.1,
                                              dropout_seed=3)
                return jnp.sum(o.astype(jnp.float32))

            for name, f in (("relpos in-kernel", loss_new),
                            ("relpos bias-HBM", loss_old)):
                run_pair(f"{name} fwd",
                         lambda q, k, v, kl, f=f:
                         f(q, k, v, kl).astype(jnp.bfloat16))
                run_pair(f"{name} fwd+bwd",
                         lambda q, k, v, kl, f=f: sum(
                             jnp.sum(g.astype(jnp.float32)) for g in
                             jax.grad(f, argnums=(0, 1, 2))(q, k, v, kl)
                         ).astype(jnp.bfloat16))
        if "blocks" in modes or "cblocks" in modes:
            # (block_q, block_k) sweep at the training config
            # (fwd+bwd, dropout 0.1 — what the 6-layer decoder pays).
            # "cblocks": causal=True — the DECODER's actual mask; with
            # causal the kernel runtime-skips fully-future k blocks
            # (pl.when), so small bk trades skip savings against
            # running-max rescale traffic.
            causal = "cblocks" in modes
            for bq in (128, 256, 512, 1024):
                for bk in (256, 512, 1024):
                    if bq > t or bk > t:
                        continue

                    def loss_b(q, k, v, kl, bq=bq, bk=bk):
                        o = flash_attention(q, k, v, kl, dropout_rate=0.1,
                                            dropout_seed=3, block_q=bq,
                                            block_k=bk, causal=causal)
                        return jnp.sum(o.astype(jnp.float32))

                    run_pair(f"flash drop{' causal' if causal else ''} "
                             f"bq={bq} bk={bk}",
                             lambda q, k, v, kl, f=loss_b: sum(
                                 jnp.sum(g.astype(jnp.float32)) for g in
                                 jax.grad(f, argnums=(0, 1, 2))(q, k, v, kl)
                             ).astype(jnp.bfloat16))
        if "bwd" in modes:
            def loss_flash(q, k, v, kl):
                return jnp.sum(flash_attention(q, k, v, kl)
                               .astype(jnp.float32))

            def loss_xla(q, k, v, kl):
                return jnp.sum(reference_attention(q, k, v, kl)
                               .astype(jnp.float32))

            run_pair("flash fwd+bwd", lambda q, k, v, kl: sum(
                jnp.sum(g.astype(jnp.float32)) for g in
                jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v, kl)
            ).astype(jnp.bfloat16))
            run_pair("xla fwd+bwd", lambda q, k, v, kl: sum(
                jnp.sum(g.astype(jnp.float32)) for g in
                jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v, kl)
            ).astype(jnp.bfloat16))


if __name__ == "__main__":
    main()
