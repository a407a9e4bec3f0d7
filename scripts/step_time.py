"""Time the FS2 train step + batch-1 synthesis at the bench shapes.

Minimal chip A/B probe for attention/projection changes: prints step ms
(honest chained-slope clock) for the exact configuration bench.py's
train and headline sections measure. Compare against the current
BENCH_rXX line before/after a change.

Run: python scripts/step_time.py [--synth]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from transformer_tts_tpu.bench_utils import (  # noqa: E402
    enable_compilation_cache, slope_time)


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.ops.masks import create_masks
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    hp = HParams(amp=True, batch_size=16)
    rng = jax.random.PRNGKey(0)
    model, state = init_fastspeech2_state(hp, rng)
    rs = np.random.RandomState(0)

    b, lt, tt = 32, 64, 1024
    batch = {
        "text": jnp.asarray(
            rs.randint(1, hp.vocab_size, (b, lt)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, lt + 1)[None], (b, 1)),
        "mel": jnp.asarray(rs.randn(b, tt, hp.mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, tt + 1)[None], (b, 1)),
        "alignment": jnp.full((b, lt), tt // lt, jnp.int32),
        "f0": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 100),
    }
    step_fn = make_fastspeech2_train_step(model, hp, donate=False)
    step_rng = jax.random.key(1, impl=hp.prng_impl)

    def train_chain(k):
        s, logs = state, None
        for _ in range(k):
            s, logs = step_fn(s, batch, step_rng)
        return float(logs["loss_total"])

    t0 = time.perf_counter()
    train_chain(2)
    print(f"compile+warm: {time.perf_counter()-t0:.1f}s")
    r = slope_time(train_chain, 8)
    print(f"train step: {r.per_iter*1e3:.2f} ms (min {r.per_iter_min*1e3:.2f})"
          f" = {b*tt/r.per_iter/1e3:.0f}k frames/s")

    if "--synth" in sys.argv:
        l, t = 128, 768
        text = jnp.asarray(
            rs.randint(1, hp.vocab_size, (1, l)).astype(np.int32))
        pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (1, 1))
        src_mask, _ = create_masks(pos_text, None)
        d_target = jnp.full((1, l), t // l, jnp.int32)

        @jax.jit
        def synth(params, batch_stats, carry):
            tx = text + (carry * 0).astype(jnp.int32)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats,
                 "vq_stats": {}},
                tx, src_mask, t, d_target, train=False)
            return jnp.sum(out.mel_post)

        def chain(k):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(k):
                carry = synth(state.params, state.batch_stats, carry)
            return float(carry)

        chain(2)
        r = slope_time(chain, 16)
        print(f"synth marginal: {r.per_iter*1e3:.3f} ms/utt "
              f"(min {r.per_iter_min*1e3:.3f})")


if __name__ == "__main__":
    main()
