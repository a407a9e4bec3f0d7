"""Train-step cost across every model family (honest clock).

One table, parity config (d_model 384, 6+6 layers, 4 heads, mel 80),
32x1024-frame bucket, production settings (amp bf16, rbg dropout keys,
flash attention where the family supports it).

Run: python scripts/family_bench.py [family ...]
Families: fs2 conformer sq ar taco melmel integrate
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, L, T = 32, 64, 1024


def fs2_batch(rs, hp, jnp):
    return {
        "text": jnp.asarray(rs.randint(1, hp.vocab_size, (B, L)).astype(
            np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, L + 1)[None], (B, 1)),
        "mel": jnp.asarray(rs.randn(B, T, hp.mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, T + 1)[None], (B, 1)),
        "alignment": jnp.full((B, L), T // L, jnp.int32),
        "f0": jnp.asarray(rs.rand(B, T).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(B, T).astype(np.float32) * 100),
    }


def ar_batch(rs, hp, jnp):
    b = fs2_batch(rs, hp, jnp)
    b["stop_token"] = jnp.zeros((B, T), jnp.float32).at[:, -1].set(1.0)
    return b


def time_step(name, step_fn, state, batch, rng, n_long=6, repeats=7):
    from transformer_tts_tpu.bench_utils import slope_time

    def chain(k):
        s = state
        logs = None
        for _ in range(k):
            s, logs = step_fn(s, batch, rng)
        return float(logs["loss_total"])

    chain(2)
    tm = slope_time(chain, n_long, repeats=repeats)
    print(f"{name:34s} {tm.per_iter * 1e3:8.2f} ms/step "
          f"({B * T / tm.per_iter / 1e3:7.1f}k frames/s)", flush=True)


def main():
    from transformer_tts_tpu.bench_utils import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.train import trainer as TR
    from transformer_tts_tpu.train import post_trainers as PT

    names = sys.argv[1:] or ["fs2", "conformer", "sq", "ar", "taco",
                             "melmel", "integrate"]
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)

    def hp_for(**kw):
        hp = HParams(amp=True, batch_size=B, **kw)
        return hp

    for name in names:
        if name == "fs2":
            hp = hp_for()
            model, state = TR.init_fastspeech2_state(hp, rng)
            step = TR.make_fastspeech2_train_step(model, hp, donate=False)
            time_step("FastSpeech2 (transformer)", step, state,
                      fs2_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl))
        elif name == "conformer":
            hp = hp_for(encoder_type="conformer", decoder_type="conformer")
            model, state = TR.init_fastspeech2_state(hp, rng)
            step = TR.make_fastspeech2_train_step(model, hp, donate=False)
            time_step("FastSpeech2 (conformer)", step, state,
                      fs2_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl), n_long=4)
        elif name == "sq":
            hp = hp_for(model="SQFastspeech2")
            model, state = TR.init_sq_fastspeech2_state(hp, rng)
            step = TR.make_sq_fastspeech2_train_step(model, hp,
                                                     donate=False)
            time_step("SQ-VAE FastSpeech2", step, state,
                      fs2_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl), n_long=4)
        elif name == "ar":
            hp = hp_for(model="Transformer", reduction_rate=2,
                        ff_conv_kernel_size_decoder=1)
            model, state = TR.init_transformer_state(hp, rng)
            step = TR.make_transformer_train_step(model, hp, donate=False)
            time_step("AR Transformer-TTS (r=2)", step, state,
                      ar_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl), n_long=4)
        elif name == "taco":
            hp = hp_for(model="Transformer", reduction_rate=2,
                        decoder_type="tacotron2")
            model, state = TR.init_transformer_state(hp, rng)
            step = TR.make_transformer_train_step(model, hp, donate=False)
            time_step("AR Tacotron2 decoder (scan LSTM)", step, state,
                      ar_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl), n_long=3,
                      repeats=5)
        elif name == "melmel":
            hp = hp_for(architecture="mel-mel", version=3,
                        mel_dim_post=80, n_layer_post_model=6)
            teacher, t_state = TR.init_fastspeech2_state(hp, rng)
            t_vars = {"params": t_state.params,
                      "batch_stats": t_state.batch_stats,
                      "vq_stats": t_state.vq_stats}
            student, s_state = PT.init_post_state(hp, rng, teacher)
            step = PT.make_meltomel_train_step(teacher, t_vars, student,
                                              hp, donate=False)
            time_step("mel-mel PostLowEnergy v3", step, s_state,
                      fs2_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl), n_long=4)
        elif name == "integrate":
            hp = hp_for(architecture="text-mel-mel", version=3,
                        mel_dim_post=80, n_layer_post_model=6)
            model, state = TR.init_fastspeech2_state(
                hp, rng, enable_post_model=True)
            step = PT.make_integrate_train_step(model, hp, donate=False)
            time_step("integrate (text-mel-mel v3)", step, state,
                      fs2_batch(rs, hp, jnp),
                      jax.random.key(1, impl=hp.prng_impl), n_long=4)


if __name__ == "__main__":
    main()
