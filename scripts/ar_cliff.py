"""Locate the AR decode per-step cost cliff between 125 and 250 steps."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.train.trainer import init_transformer_state
    from transformer_tts_tpu.infer.synthesize import (
        synthesize_transformer_tts)

    rs = np.random.RandomState(0)
    hp = HParams(model="Transformer", amp=True, batch_size=8,
                 reduction_rate=2)
    model, state = init_transformer_state(hp, jax.random.PRNGKey(0))
    v = {"params": state.params, "batch_stats": state.batch_stats}
    text = jnp.asarray(rs.randint(1, 152, (1, 128)).astype(np.int32))
    pos = jnp.tile(jnp.arange(1, 129)[None], (1, 1))

    for steps in (128, 160, 192, 256):
        mel, _ = synthesize_transformer_tts(
            model, v, text, pos, max_steps=steps, stop_threshold=2.0)
        mel.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            mel, _ = synthesize_transformer_tts(
                model, v, text, pos, max_steps=steps, stop_threshold=2.0)
        mel.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"steps={steps} total={dt * 1e3:.3f}ms "
              f"per_step={dt / steps * 1e6:.2f}us", flush=True)


if __name__ == "__main__":
    main()
