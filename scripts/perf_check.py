"""Ad-hoc perf validation on the real chip.

1. AR decode loop: time must scale ~linearly with max_steps and every
   decoded frame must be nonzero (loop really iterates).
2. Flash-attention A/B at eval on the parity config, several mel lengths.

Run: python scripts/perf_check.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
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
        mel, lengths = synthesize_transformer_tts(
            model, v, text, pos, max_steps=steps, stop_threshold=2.0)
        mel.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            mel, lengths = synthesize_transformer_tts(
                model, v, text, pos, max_steps=steps, stop_threshold=2.0)
        mel.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        nz = int(jnp.sum(jnp.any(mel != 0, axis=-1)))
        print(f"AR steps={steps} time={dt * 1e3:.3f}ms "
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

            def fwd(params, bstats):
                out = m.apply(
                    {"params": params, "batch_stats": bstats,
                     "vq_stats": {}},
                    txt, src_mask, t, d_target, train=False)
                return out.mel_post
            jfwd = jax.jit(fwd)
            r = jfwd(st.params, st.batch_stats)
            r.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(20):
                r = jfwd(st.params, st.batch_stats)
            r.block_until_ready()
            times[flash] = (time.perf_counter() - t0) / 20 * 1e3
        print(f"eval T={t}: flash {times[True]:.3f}ms "
              f"xla {times[False]:.3f}ms", flush=True)


if __name__ == "__main__":
    main()
