"""Ad-hoc perf validation on the real chip (honest clock).

1. AR decode loop: slope-timed cost must scale ~linearly with max_steps
   and every decoded frame must be nonzero (loop really iterates).
2. Flash-attention A/B at eval on the parity config, several mel lengths.

All timings use bench_utils.slope_time (data-dependency-chained
iterations closed by a host transfer) — block_until_ready does NOT block
on this platform; see transformer_tts_tpu/bench_utils.py.

Run: python scripts/perf_check.py
"""

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
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.ops.masks import create_masks
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, init_transformer_state)
    from transformer_tts_tpu.infer.synthesize import (
        synthesize_transformer_tts)

    rs = np.random.RandomState(0)

    # ---- 1. AR loop scaling ----
    hp = HParams(model="Transformer", amp=True, batch_size=8,
                 reduction_rate=2)
    model, state = init_transformer_state(hp, jax.random.PRNGKey(0))
    v = {"params": state.params, "batch_stats": state.batch_stats}
    text = jnp.asarray(rs.randint(1, 152, (1, 128)).astype(np.int32))
    pos = jnp.tile(jnp.arange(1, 129)[None], (1, 1))
    for steps in (125, 250):
        def ar_chain(k, steps=steps):
            carry = jnp.zeros((), jnp.float32)
            mel = None
            for _ in range(k):
                txt = text + (carry * 0).astype(jnp.int32)
                mel, lengths = synthesize_transformer_tts(
                    model, v, txt, pos, max_steps=steps,
                    stop_threshold=2.0)
                carry = jnp.sum(mel)
            return float(carry)
        ar_chain(1)  # compile
        tm = slope_time(ar_chain, 6, repeats=7)
        mel, lengths = synthesize_transformer_tts(
            model, v, text, pos, max_steps=steps, stop_threshold=2.0)
        nz = int(jnp.sum(jnp.any(mel != 0, axis=-1)))
        print(f"AR steps={steps} time={tm.per_iter * 1e3:.3f}ms "
              f"({tm.per_iter / steps * 1e3:.4f} ms/step) "
              f"len={int(lengths[0])} nonzero_frames={nz}", flush=True)

    # ---- 2. flash A/B at eval ----
    for t in (512, 1024, 2048):
        times = {}
        for flash in (True, False):
            hp = HParams(amp=True, batch_size=8, use_flash_attention=flash)
            m, st = init_fastspeech2_state(hp, jax.random.PRNGKey(0))
            l = 128
            txt = jnp.asarray(
                rs.randint(1, hp.vocab_size, (8, l)).astype(np.int32))
            ptx = jnp.tile(jnp.arange(1, l + 1)[None], (8, 1))
            src_mask, _ = create_masks(ptx, None)
            d_target = jnp.full((8, l), t // l, jnp.int32)

            @jax.jit
            def fwd(params, bstats, txt_in, carry):
                txt_in = txt_in + (carry * 0).astype(jnp.int32)
                out = m.apply(
                    {"params": params, "batch_stats": bstats,
                     "vq_stats": {}},
                    txt_in, src_mask, t, d_target, train=False)
                return jnp.sum(out.mel_post)

            def chain(k):
                carry = jnp.zeros((), jnp.float32)
                for _ in range(k):
                    carry = fwd(st.params, st.batch_stats, txt, carry)
                return float(carry)

            chain(1)  # compile
            times[flash] = slope_time(chain, 12, repeats=7).per_iter * 1e3
        print(f"eval T={t}: flash {times[True]:.3f}ms "
              f"xla {times[False]:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
